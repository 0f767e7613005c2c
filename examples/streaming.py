"""Streaming generation: partial text after every decode window (SSE-style
UX without the HTTP server; see mellow_tpu/server.py for the
/generate_stream endpoint). The reference's loop returns only at the end
(mellow/wrapper.py:216-256)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from examples.common import AUDIO1, AUDIO2, build_wrapper

if __name__ == "__main__":
    wrapper = build_wrapper("v0", "v0")
    examples = [[AUDIO1, AUDIO2, "caption the first audio"]]
    final = None
    for texts in wrapper.generate_stream(examples, max_len=64):
        final = texts[0]
        print(f"\r{final!r}", end="", file=sys.stderr, flush=True)
    print(file=sys.stderr)
    print(f"final: {final!r}")
