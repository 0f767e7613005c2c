"""Back-compat shim — real module: mellow_tpu.tools.eval_reasonaqa."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mellow_tpu.tools.eval_reasonaqa import main  # noqa: F401,E402

if __name__ == "__main__":
    main()
