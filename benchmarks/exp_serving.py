"""Experiment: continuous batching vs batch-at-a-time coalescing on a
Poisson-arrival heterogeneous workload (VERDICT r3 item 3).

Workload: N requests over the reference wavs, arrivals ~ Poisson(rate),
50% short answers (max_len=SHORT tokens — the binary-AQA analog) and 50%
long (max_len=LONG — captions), submitted from a client thread at their
arrival times. Both engines see the IDENTICAL arrival trace:

  * BatchingEngine (batch-at-a-time): coalesces same-key arrivals into a
    bucketed generate() per batch; a slot is held until the whole batch
    drains, and late arrivals wait the batch out. (dynamic_batch=True —
    cascade compaction — so this baseline is already the r3-optimized
    one, not a strawman. NOTE: max_len is part of the batch KEY here, so
    the short/long mix splits into two queues — the engine's design,
    serving.py:33.)
  * ContinuousBatchingEngine: one live slot bank; freed slots admit
    queued requests mid-flight (models/continuous.py).

Reported per engine: makespan, requests/s, mean/p50/p95 latency
(submit -> result). A correctness spot-check compares a subset of outputs
to solo wrapper.generate calls (greedy — must match exactly).

Usage: python benchmarks/exp_serving.py [N] [rate_req_s] [slots]
"""

import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")

REF_WAV1 = "/root/reference/resource/1.wav"
REF_WAV2 = "/root/reference/resource/2.wav"
SHORT, LONG = 8, 96


def drive(engine, arrivals, reqs):
    """Submit each request at its arrival offset; return per-request
    latencies and the makespan."""
    futures = [None] * len(reqs)
    lat = [0.0] * len(reqs)
    t0 = time.time()

    def client(i):
        time.sleep(max(0.0, t0 + arrivals[i] - time.time()))
        sub = time.time()
        futures[i] = engine.submit(
            REF_WAV1, REF_WAV2, reqs[i][0], max_len=reqs[i][1]
        )
        futures[i].add_done_callback(
            lambda f, i=i, sub=sub: lat.__setitem__(i, time.time() - sub)
        )

    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(len(reqs))
    ]
    for t in threads:
        t.start()
    results = []
    for i, t in enumerate(threads):
        t.join()
    for f in futures:
        results.append(f.result(timeout=1200))
    makespan = time.time() - t0
    return results, np.asarray(lat), makespan


def main(N=64, rate=12.0, slots=32, wrapper=None, short=SHORT, long_=LONG):
    """Returns {"continuous_rps", "batch_rps", "speedup", "agreement"} so
    bench.py can record a serving-level Poisson number in the artifact."""
    from mellow_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    from mellow_tpu.cli import build_wrapper
    from mellow_tpu.serving import BatchingEngine, ContinuousBatchingEngine

    global SHORT, LONG
    SHORT, LONG = short, long_
    if wrapper is None:
        wrapper = build_wrapper("v0", "v0", weight_dtype="int8")
    rng = np.random.RandomState(0)
    arrivals = np.cumsum(rng.exponential(1.0 / rate, N))
    reqs = [
        (f"describe the audio pair number {i}",
         SHORT if rng.rand() < 0.5 else LONG)
        for i in range(N)
    ]
    log = lambda *a: print(*a, file=sys.stderr, flush=True)  # noqa: E731
    log(f"workload: N={N} Poisson rate={rate}/s "
        f"({(np.asarray([r[1] for r in reqs]) == SHORT).mean():.0%} short), "
        f"slots={slots}")

    out = {}
    for name in ("continuous", "batch"):
        if name == "batch":
            eng = BatchingEngine(
                wrapper, max_batch_size=slots, max_wait_ms=30.0,
                dynamic_batch=True,
            )
        else:
            # Same bf16 kv cache as the batch engine's generate path (a
            # fair A/B, and greedy outputs stay comparable across engines
            # — int8 caches would add quantization-point divergence).
            eng = ContinuousBatchingEngine(wrapper, slots=slots, horizon=512)
        # Warm the compiles OUTSIDE the timed run (both engines pay
        # compile only once in a long-lived server). A FULL slot wave,
        # not just one request per max_len: the continuous engine
        # compiles one admit program per pow-2 admission size and one
        # encode program per pow-2 arrival bucket, and the batch engine
        # one generate per batch bucket — a 2-request warmup left most
        # of those compiles INSIDE the timed window, which is why r5
        # same-code runs spread 1.37x-2.34x (the 2.01x/2.34x runs had
        # warm persistent caches). A long-lived server pays these once.
        warm = [eng.submit(REF_WAV1, REF_WAV2, f"warmup{i}",
                           max_len=SHORT if i % 2 else LONG)
                for i in range(max(2, slots))]
        for f in warm:
            f.result(timeout=2400)
        results, lat, makespan = drive(eng, arrivals, reqs)
        eng.shutdown()
        out[name] = (results, lat, makespan)
        log(f"{name:11s}: makespan {makespan:6.2f}s "
            f"({N / makespan:5.2f} req/s) | latency mean "
            f"{lat.mean():5.2f}s p50 {np.percentile(lat, 50):5.2f}s "
            f"p95 {np.percentile(lat, 95):5.2f}s")

    # Engines must agree with each other on every output (both greedy).
    mismatch = sum(
        a != b for a, b in zip(out["continuous"][0], out["batch"][0])
    )
    log(f"output agreement continuous==batch: {N - mismatch}/{N}")
    # Spot-check vs solo runs (the ground truth for both).
    for i in np.linspace(0, N - 1, 4, dtype=int):
        solo = wrapper.generate(
            [[REF_WAV1, REF_WAV2, reqs[i][0]]], max_len=reqs[i][1],
        )[0]
        ok_c = out["continuous"][0][i] == solo
        ok_b = out["batch"][0][i] == solo
        log(f"req {i:3d} solo-match: continuous={ok_c} batch={ok_b}")
    speed = out["batch"][2] / out["continuous"][2]
    log(f"SPEEDUP (makespan): {speed:.2f}x; latency p50 "
        f"{out['batch'][1].mean() / max(out['continuous'][1].mean(), 1e-9):.2f}x"
        f" (mean)")
    return {
        "continuous_rps": N / out["continuous"][2],
        "batch_rps": N / out["batch"][2],
        "speedup": speed,
        "agreement": (N - mismatch) / N,
    }


if __name__ == "__main__":
    args = [float(a) for a in sys.argv[1:]]
    main(*[int(a) if i != 1 else a for i, a in enumerate(args)])
