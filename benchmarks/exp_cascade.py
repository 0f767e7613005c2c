"""Experiment: dead decode compute on a heterogeneous stop-length mix, and
what cascade compaction (generate_cascade) reclaims.

The reference decodes until the LAST row finishes (wrapper.py:247-248);
VERDICT r2 item 4 asks for (a) a measurement of the wasted row-steps on a
realistic mixed workload and (b) an engine that beats the static batch on
it. With random weights we cannot script which rows answer short, so the
mix is induced naturally: stop_token_id is chosen as the most frequent
token across the batch's greedy streams — many rows then stop early
(binary-answer analog) while others run to max_len (caption analog). The
REPORTED waste is computed from the static run's own per-row stop
positions, so it is exact for whatever mix materialized.

Usage: python benchmarks/exp_cascade.py [B] [max_len]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main(B=256, max_len=144):
    import jax
    import jax.numpy as jnp

    from mellow_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()

    from mellow_tpu.config import get_config
    from mellow_tpu.models import generate as gen
    from mellow_tpu.models import llama, mellow as mellow_model

    cfg = get_config("v0")
    dtype = jnp.bfloat16
    params = mellow_model.init_params(jax.random.PRNGKey(0), cfg, dtype)
    dec = llama.quantize_decoder(params["decoder"], cfg.decoder)
    rng = np.random.RandomState(0)
    prefix = jnp.asarray(rng.randn(B, cfg.prefix_length, cfg.d_proj) * 0.02, dtype)

    kw = dict(max_len=max_len, greedy=True, cache_dtype="int8")

    # Pick the stop id that maximizes early stopping across rows.
    r0 = gen.generate(dec, cfg.decoder, prefix, stop_token_id=-1, **kw)
    toks0 = np.asarray(r0.tokens)
    vals, counts = np.unique(toks0[:, : max_len // 2], return_counts=True)
    stop = int(vals[np.argmax(counts)])

    def run_static():
        return gen.generate(dec, cfg.decoder, prefix, stop_token_id=stop, **kw)

    def run_cascade():
        return gen.generate_cascade(
            dec, cfg.decoder, prefix, stop_token_id=stop, min_batch=32, **kw
        )

    def timeit(fn, reps=3):
        r = fn()
        jax.block_until_ready(r.tokens)  # compile
        ts = []
        for _ in range(reps):
            t0 = time.time()
            r = fn()
            jax.block_until_ready(r.tokens)
            ts.append(time.time() - t0)
        return min(ts), r

    t_static, r_s = timeit(run_static)
    t_casc, r_c = timeit(run_cascade)

    # Waste accounting from the static run's own stop positions.
    ts = np.asarray(r_s.tokens)
    n = int(r_s.num_steps)
    stop_pos = np.where(
        (ts[:, :n] == stop).any(1), (ts[:, :n] == stop).argmax(1) + 1, n
    )
    useful = int(stop_pos.sum())
    waste = 1.0 - useful / (B * n)
    print(f"B={B} max_len={max_len} stop_id={stop}")
    print(
        f"stop-length mix: p10/p50/p90 = {np.percentile(stop_pos, 10):.0f}/"
        f"{np.percentile(stop_pos, 50):.0f}/{np.percentile(stop_pos, 90):.0f}"
        f" steps; {100*(stop_pos < n).mean():.0f}% of rows stop before the end"
    )
    print(
        f"dead row-steps in the static batch: {100*waste:.1f}% "
        f"({B*n - useful} of {B*n})"
    )
    # Per-row trimmed-token equality (greedy: must match exactly).
    tc = np.asarray(r_c.tokens)
    nc = int(r_c.num_steps)

    def trim(row, k):
        row = row[:k]
        i = np.nonzero(row == stop)[0]
        return row[: i[0] + 1].tolist() if len(i) else row.tolist()

    mismatch = sum(trim(ts[i], n) != trim(tc[i], nc) for i in range(B))
    print(f"cascade vs static trimmed-row mismatches: {mismatch}/{B}")
    gps_s, gps_c = B / t_static, B / t_casc
    print(
        f"static : {t_static*1e3:7.1f} ms -> {gps_s:7.1f} generations/s\n"
        f"cascade: {t_casc*1e3:7.1f} ms -> {gps_c:7.1f} generations/s "
        f"({gps_c/gps_s:.2f}x)"
    )


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    ml = int(sys.argv[2]) if len(sys.argv) > 2 else 144
    main(B, ml)
