"""ReasonAQA evaluation harness.

The reference describes ReasonAQA evaluation but ships no eval code
(README.md:81-114: download the JSONs, run yourself). This runs the model
over a test.json (schema documented in mellow_tpu/train/data.py), batched,
and reports per-subtype and overall metrics:

  * exact-match accuracy (normalized: lowercase, stripped, no trailing '.')
    — the right metric for MCQ / binary / entailment subtypes;
  * token-level F1 (SQuAD-style) — informative for captioning/difference.

Usage:
  python tools/evaluate.py test.json --audio-root /data --params v0.npz \
      --batch-size 16 --max-len 300 [--limit N]
"""

from __future__ import annotations

import argparse
import collections
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def normalize(text: str) -> str:
    return " ".join(text.lower().strip().rstrip(".").split())


def token_f1(pred: str, ref: str) -> float:
    p, r = normalize(pred).split(), normalize(ref).split()
    if not p or not r:
        return float(p == r)
    common = collections.Counter(p) & collections.Counter(r)
    overlap = sum(common.values())
    if overlap == 0:
        return 0.0
    precision = overlap / len(p)
    recall = overlap / len(r)
    return 2 * precision * recall / (precision + recall)


def evaluate(wrapper, rows, batch_size: int, max_len: int, top_p=0.8, temperature=1.0):
    stats = collections.defaultdict(lambda: {"n": 0, "em": 0.0, "f1": 0.0})
    t0 = time.time()
    for i in range(0, len(rows), batch_size):
        chunk = rows[i : i + batch_size]
        examples = [
            [r.filepath1, r.filepath2 or r.filepath1, r.input] for r in chunk
        ]
        preds = wrapper.generate(
            examples, max_len=max_len, top_p=top_p, temperature=temperature
        )
        for r, pred in zip(chunk, preds):
            s = stats[r.subtype or "all"]
            s["n"] += 1
            s["em"] += float(normalize(pred) == normalize(r.answer))
            s["f1"] += token_f1(pred, r.answer)
        done = min(i + batch_size, len(rows))
        print(
            f"[eval] {done}/{len(rows)} ({done / (time.time() - t0):.2f} ex/s)",
            file=sys.stderr,
        )

    out = {}
    total = {"n": 0, "em": 0.0, "f1": 0.0}
    for sub, s in sorted(stats.items()):
        out[sub] = {
            "n": s["n"],
            "exact_match": round(s["em"] / s["n"], 4),
            "token_f1": round(s["f1"] / s["n"], 4),
        }
        total["n"] += s["n"]
        total["em"] += s["em"]
        total["f1"] += s["f1"]
    out["OVERALL"] = {
        "n": total["n"],
        "exact_match": round(total["em"] / max(total["n"], 1), 4),
        "token_f1": round(total["f1"] / max(total["n"], 1), 4),
    }
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("test_json")
    ap.add_argument("--audio-root", default="")
    ap.add_argument("--config", default="v0")
    ap.add_argument("--model", default="v0")
    ap.add_argument("--params", default=None, help=".npz from convert_ckpt")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--max-len", type=int, default=300)
    ap.add_argument("--top-p", type=float, default=0.8)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args(argv)

    from mellow_tpu.train.data import load_json
    from mellow_tpu.wrapper import MellowWrapper

    rows = load_json(args.test_json, args.audio_root)
    if args.limit:
        rows = rows[: args.limit]
    wrapper = MellowWrapper(args.config, args.model, 0, params_path=args.params)
    results = evaluate(wrapper, rows, args.batch_size, args.max_len,
                       args.top_p, args.temperature)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
