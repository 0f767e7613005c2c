"""Batched serving engine.

The reference has no serving story (single blocking wrapper call). This
provides a production-style front: concurrent callers submit single
examples; a background dispatcher coalesces them into bucketed device
batches (amortizing the per-call fixed cost that dominates small batches on
TPU — see bench decode scaling), runs one jitted generate, and resolves each
caller's future. Generation parameters are part of the batch key so mixed
workloads never cross-contaminate.

Fairness: requests are kept in PER-KEY FIFO queues and the dispatcher
always serves the key whose head request is oldest — a mismatched-key
request can never be starved by a stream of new arrivals (the round-2
put-back design could re-queue it behind them indefinitely).

Timeouts: ``submit(..., timeout=...)`` bounds total time-in-system; the
dispatcher expires overdue requests with ``TimeoutError`` instead of
batching them.
"""

from __future__ import annotations

import itertools
import queue
import threading
import time
from collections import OrderedDict, deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Deque, Dict, List, Optional, Sequence, Tuple


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
    seq: int
    deadline: Optional[float]  # monotonic time; None = no timeout
    future: Future = field(default_factory=Future)


class BatchingEngine:
    def __init__(
        self,
        wrapper,
        max_batch_size: int = 32,
        max_wait_ms: float = 10.0,
        dynamic_batch: bool = True,
    ):
        self.wrapper = wrapper
        self.max_batch_size = max_batch_size
        self.max_wait_s = max_wait_ms / 1000.0
        # Continuous-batching analog: cascade compaction (generate_cascade)
        # lets short answers (1-2-token AQA) stop paying decode steps while
        # long captions in the same batch run on — the serving mix is
        # exactly the heterogeneous workload it reclaims.
        self.dynamic_batch = dynamic_batch
        self._inbox: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._seq = itertools.count()
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
        timeout: Optional[float] = None,  # seconds in-system before the
        # dispatcher fails the request with TimeoutError
    ) -> Future:
        """Non-blocking: returns a Future resolving to the generated str."""
        if not self._running:
            raise RuntimeError("engine is shut down")
        req = _Request(
            [audio_path1, audio_path2, prompt],
            _BatchKey(max_len, top_p, temperature, sample),
            next(self._seq),
            None if timeout is None else time.monotonic() + timeout,
        )
        self._inbox.put(req)
        return req.future

    def generate(self, *args, timeout: Optional[float] = None, **kwargs) -> str:
        """Blocking convenience wrapper around submit()."""
        return self.submit(*args, timeout=timeout, **kwargs).result(timeout)

    def shutdown(self) -> None:
        self._running = False
        self._inbox.put(None)
        self._thread.join(timeout=30)

    # ------------------------------------------------------------------
    # dispatcher
    # ------------------------------------------------------------------

    def _pull(self, pending: "OrderedDict[_BatchKey, Deque[_Request]]",
              block: bool, deadline: Optional[float]) -> bool:
        """Move inbox arrivals into the per-key queues. Returns False when
        the shutdown sentinel was seen."""
        first = True
        while True:
            try:
                if block and first:
                    req = self._inbox.get(
                        timeout=None if deadline is None else max(0.0, deadline - time.monotonic())
                    )
                else:
                    req = self._inbox.get_nowait()
            except queue.Empty:
                return True
            first = False
            if req is None:
                return False
            pending.setdefault(req.key, deque()).append(req)

    @staticmethod
    def _expire(pending: "OrderedDict[_BatchKey, Deque[_Request]]") -> None:
        now = time.monotonic()
        for key in list(pending):
            q = pending[key]
            live = deque(r for r in q if not (r.deadline and r.deadline < now))
            for r in q:
                if r.deadline and r.deadline < now:
                    r.future.set_exception(
                        TimeoutError("request expired in queue")
                    )
            if live:
                pending[key] = live
            else:
                del pending[key]

    def _loop(self) -> None:
        pending: "OrderedDict[_BatchKey, Deque[_Request]]" = OrderedDict()
        alive = True
        while alive:
            # Block only when idle; with work queued, just sweep arrivals.
            alive = self._pull(pending, block=not pending, deadline=None)
            self._expire(pending)
            if not pending:
                continue
            # FIFO fairness: serve the key whose HEAD request is oldest.
            key = min(pending, key=lambda k: pending[k][0].seq)
            batch_q = pending[key]
            # Wait (bounded) for same-key stragglers while the batch fills.
            wait_until = time.monotonic() + self.max_wait_s
            while alive and len(batch_q) < self.max_batch_size:
                alive = self._pull(pending, block=True, deadline=wait_until)
                if time.monotonic() >= wait_until:
                    break
            batch = [batch_q.popleft() for _ in range(min(len(batch_q), self.max_batch_size))]
            if not batch_q:
                del pending[key]
            self._run(batch)
        # Shutdown: fail anything still queued (predictable teardown beats
        # running an unbounded backlog inside shutdown()'s join window).
        self._pull(pending, block=False, deadline=None)
        for q in pending.values():
            for r in q:
                if not r.future.done():
                    r.future.set_exception(RuntimeError("engine shut down"))

    def _run(self, batch: List[_Request]) -> None:
        key = batch[0].key
        try:
            preds = self.wrapper.generate(
                [r.example for r in batch],
                max_len=key.max_len,
                top_p=key.top_p,
                temperature=key.temperature,
                sample=key.sample,
                dynamic_batch=self.dynamic_batch,
            )
            for r, pred in zip(batch, preds):
                r.future.set_result(pred)
        except Exception as e:  # propagate to every waiter
            for r in batch:
                if not r.future.done():
                    r.future.set_exception(e)


class ContinuousBatchingEngine:
    """Continuous batching: one LIVE decode batch whose freed slots admit
    queued requests mid-flight (models/continuous.ContinuousScheduler),
    instead of coalescing arrivals into batch-at-a-time generate calls.

    Why it wins on mixed workloads: under ``BatchingEngine`` a 2-token
    binary-AQA answer coalesced with 100-token captions holds its slot
    for the full batch lifetime (the reference's own semantics,
    /root/reference/mellow/wrapper.py:247-256), and a request arriving
    just after a batch launched waits the whole batch out. Here a slot
    frees the moment its row finishes (stage granularity = one flush
    window) and the next request's prefill splices into the live cache.
    Measured A/B on a Poisson-arrival mix: benchmarks/exp_serving.py.

    Greedy by default with engine-wide decode knobs (every slot shares
    the jitted stage program); per-request ``max_len``. With
    ``per_request=True`` (r5), requests may carry their own
    temperature/top_p/sample knobs — the stage then runs the per-row
    sampler for every slot (greedy rows select their argmax), so leave
    it off for pure-greedy serving. Greedy outputs are identical to solo
    ``wrapper.generate`` calls (tests/test_continuous.py,
    tests/test_serving.py).
    """

    def __init__(
        self,
        wrapper,
        slots: int = 8,
        horizon: int = 512,
        stop_token: str = "<|endoftext|>",
        kv_cache_dtype: Optional[str] = None,
        flush_window: int = 8,
        per_request: bool = False,
        seed: int = 0,
    ):
        import jax
        import jax.numpy as jnp

        from mellow_tpu.models import continuous as cb
        from mellow_tpu.models import mellow as mellow_model

        if wrapper.cfg.decoder_family != "llama":
            raise ValueError("continuous batching is llama-family only")
        if wrapper.mesh is not None:
            raise ValueError(
                "continuous batching is single-device (the slot cache is "
                "one live buffer); use BatchingEngine under a mesh"
            )
        self.wrapper = wrapper
        self._stop_token = stop_token
        try:
            stop_id = int(wrapper.tokenizer.encode(stop_token)[0])
        except Exception:
            stop_id = wrapper.cfg.stop_token_id
        self._dtype = jnp.dtype(wrapper.cfg.compute_dtype)
        params = wrapper.params
        if self._dtype != jnp.float32:
            params = jax.tree.map(
                lambda x: x.astype(self._dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                params,
            )
        self._params = params
        self._encode = mellow_model._encode_prefix_jit
        self._per_request = per_request
        self._sched = cb.ContinuousScheduler(
            params["decoder"], wrapper.cfg.decoder,
            slots=slots, prefix_len=wrapper.cfg.prefix_length,
            horizon=horizon, stop_token_id=stop_id,
            cache_dtype=kv_cache_dtype or str(self._dtype),
            dtype=self._dtype, greedy=True, W=flush_window,
            per_request=per_request,
            rng=jax.random.PRNGKey(seed) if per_request else None,
        )
        self._lock = threading.Lock()  # guards _sched + _futures
        self._futures: Dict[int, Future] = {}
        self._inbox: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------

    def submit(
        self,
        audio_path1: str,
        audio_path2: str,
        prompt: str,
        *,
        max_len: int = 300,
        timeout: Optional[float] = None,
        sample: bool = False,
        top_p: float = 0.8,
        temperature: float = 1.0,
    ) -> Future:
        if not self._running:
            raise RuntimeError("engine is shut down")
        if sample and not self._per_request:
            raise ValueError(
                "sampled requests need ContinuousBatchingEngine("
                "per_request=True)"
            )
        req = _Request(
            [audio_path1, audio_path2, prompt],
            _BatchKey(max_len, top_p, temperature, sample),
            0,
            None if timeout is None else time.monotonic() + timeout,
        )
        self._inbox.put(req)
        return req.future

    def generate(self, *args, timeout: Optional[float] = None, **kw) -> str:
        return self.submit(*args, timeout=timeout, **kw).result(timeout)

    def shutdown(self) -> None:
        self._running = False
        self._inbox.put(None)
        self._thread.join(timeout=60)

    # ------------------------------------------------------------------

    def _drain(self, block: bool) -> Tuple[List[_Request], bool]:
        out: List[_Request] = []
        first = True
        while True:
            try:
                req = (
                    self._inbox.get(timeout=0.05)
                    if block and first
                    else self._inbox.get_nowait()
                )
            except queue.Empty:
                return out, True
            first = False
            if req is None:
                return out, False
            now = time.monotonic()
            if req.deadline is not None and req.deadline < now:
                req.future.set_exception(TimeoutError("request expired in queue"))
                continue
            out.append(req)

    def _encode_and_submit(self, reqs: List[_Request]) -> None:
        """Preprocess + encode arrivals in one pow-2-bucketed batch (pad
        rows repeat row 0 — bounded compiles), then hand each prefix row
        to the scheduler."""
        import jax.numpy as jnp
        import numpy as np

        w = self.wrapper
        a1 = w.preprocess_audio([r.example[0] for r in reqs], True)
        a2 = w.preprocess_audio([r.example[1] for r in reqs], True)
        ti = w.preprocess_text([r.example[2] for r in reqs])
        n = len(reqs)
        Bp = 1 << int(np.ceil(np.log2(max(1, n))))
        if Bp != n:
            rep = [0] * (Bp - n)
            a1 = np.concatenate([a1, a1[rep]])
            a2 = np.concatenate([a2, a2[rep]])
            ti = np.concatenate([ti, ti[rep]])
        prefix = self._encode(
            self._params, w.cfg,
            jnp.asarray(a1, self._dtype), jnp.asarray(a2, self._dtype),
            jnp.asarray(ti),
        )
        prefix = np.asarray(prefix)
        for i, r in enumerate(reqs):
            kw = {}
            if self._per_request:
                kw = dict(
                    greedy=not r.key.sample, top_p=r.key.top_p,
                    temperature=r.key.temperature,
                )
            rid = self._sched.submit(prefix[i], r.key.max_len, **kw)
            self._futures[rid] = r.future

    def _loop(self) -> None:
        from mellow_tpu.utils.metrics import GLOBAL as metrics

        alive = True
        while alive:
            reqs, alive = self._drain(block=self._sched.idle and alive)
            try:
                if reqs:
                    self._encode_and_submit(reqs)
                if not self._sched.idle:
                    for rid, toks in self._sched.step():
                        fut = self._futures.pop(rid, None)
                        if fut is not None and not fut.done():
                            text = self.wrapper.tokenizer.decode(toks)
                            fut.set_result(text.split(self._stop_token)[0])
                            metrics.count("continuous_requests", 1)
            except Exception as e:
                # Fail everything in flight: the slot state is suspect.
                for fut in self._futures.values():
                    if not fut.done():
                        fut.set_exception(e)
                self._futures.clear()
        # shutdown: drain + fail whatever remains
        reqs, _ = self._drain(block=False)
        for r in reqs:
            if not r.future.done():
                r.future.set_exception(RuntimeError("engine shut down"))
        for fut in self._futures.values():
            if not fut.done():
                fut.set_exception(RuntimeError("engine shut down"))
