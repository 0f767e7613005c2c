"""Smoke test, mirroring the reference's README instruction
("To test the setup is complete, run: python example.py"; reference
example.py:12-31 — MCQ over the two bundled clips)."""

from examples.common import AUDIO1, AUDIO2, build_wrapper, run

if __name__ == "__main__":
    wrapper = build_wrapper("v0", "v0")
    examples = [
        [AUDIO1, AUDIO2,
         "what can you infer about the surrounding from the audio? (a) "
         "construction site (b) rural area (c) shopping mall (d) city street"],
    ]
    run(wrapper, examples, max_len=300, top_p=0.8, temperature=1.0)
