"""Serving demo: concurrent requests through the BatchingEngine.

Several callers submit single [audio1, audio2, prompt] examples from
threads; the engine coalesces same-parameter requests into one bucketed
device batch (amortizing the per-call fixed cost that dominates small
batches on TPU) and resolves each caller's Future. The reference has no
serving story — its wrapper is a single blocking call per batch.

Run: python examples/serving.py
"""

from concurrent.futures import ThreadPoolExecutor

from common import AUDIO1, AUDIO2, build_wrapper

from mellow_tpu.serving import BatchingEngine

PROMPTS = [
    "caption the first audio.",
    "what is the difference between the two audios?",
    "is there music in either clip? answer yes or no.",
    "which audio is louder?",
]


def main():
    wrapper = build_wrapper()
    engine = BatchingEngine(wrapper, max_batch_size=8, max_wait_ms=50.0)
    try:
        # Submit concurrently from caller threads; the dispatcher coalesces
        # all four into one device batch (same generation params).
        with ThreadPoolExecutor(max_workers=4) as pool:
            futures = list(
                pool.map(
                    lambda p: engine.submit(AUDIO1, AUDIO2, p, max_len=24),
                    PROMPTS,
                )
            )
        for prompt, fut in zip(PROMPTS, futures):
            print(f"Q: {prompt}\nA: {fut.result()}\n")
    finally:
        engine.shutdown()


if __name__ == "__main__":
    main()
