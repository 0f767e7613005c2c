"""Batched serving engine.

The reference has no serving story (single blocking wrapper call). This
provides a production-style front: concurrent callers submit single
examples; a background dispatcher coalesces them into bucketed device
batches (amortizing the per-call fixed cost that dominates small batches on
TPU — see bench decode scaling), runs one jitted generate, and resolves each
caller's future. Generation parameters are part of the batch key so mixed
workloads never cross-contaminate.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import List, Sequence


@dataclass(frozen=True)
class _BatchKey:
    max_len: int
    top_p: float
    temperature: float
    sample: bool


@dataclass
class _Request:
    example: Sequence[str]  # [audio1, audio2, prompt]
    key: _BatchKey
    future: Future = field(default_factory=Future)


class BatchingEngine:
    def __init__(
        self,
        wrapper,
        max_batch_size: int = 32,
        max_wait_ms: float = 10.0,
    ):
        self.wrapper = wrapper
        self.max_batch_size = max_batch_size
        self.max_wait_s = max_wait_ms / 1000.0
        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._running = True
        self._thread.start()

    # ------------------------------------------------------------------

    def submit(
        self,
        audio_path1: str,
        audio_path2: str,
        prompt: str,
        *,
        max_len: int = 300,
        top_p: float = 0.8,
        temperature: float = 1.0,
        sample: bool = False,
    ) -> Future:
        """Non-blocking: returns a Future resolving to the generated str."""
        if not self._running:
            raise RuntimeError("engine is shut down")
        req = _Request(
            [audio_path1, audio_path2, prompt],
            _BatchKey(max_len, top_p, temperature, sample),
        )
        self._queue.put(req)
        return req.future

    def generate(self, *args, **kwargs) -> str:
        """Blocking convenience wrapper around submit()."""
        return self.submit(*args, **kwargs).result()

    def shutdown(self) -> None:
        self._running = False
        self._queue.put(None)
        self._thread.join(timeout=30)

    # ------------------------------------------------------------------

    def _drain(self, first: _Request) -> List[_Request]:
        """Collect requests with the same key up to max_batch_size, waiting
        at most max_wait_s for stragglers."""
        batch = [first]
        deadline = self.max_wait_s
        put_back: List[_Request] = []
        while len(batch) < self.max_batch_size:
            try:
                req = self._queue.get(timeout=deadline)
            except queue.Empty:
                break
            if req is None:
                self._queue.put(None)  # keep the shutdown signal
                break
            if req.key == first.key:
                batch.append(req)
            else:
                put_back.append(req)
        for req in put_back:
            self._queue.put(req)
        return batch

    def _loop(self) -> None:
        while True:
            req = self._queue.get()
            if req is None:
                return
            batch = self._drain(req)
            key = batch[0].key
            try:
                preds = self.wrapper.generate(
                    [r.example for r in batch],
                    max_len=key.max_len,
                    top_p=key.top_p,
                    temperature=key.temperature,
                    sample=key.sample,
                )
                for r, pred in zip(batch, preds):
                    r.future.set_result(pred)
            except Exception as e:  # propagate to every waiter
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)
