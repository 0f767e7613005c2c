"""Back-compat shim — real module: mellow_tpu.tools.convert_ckpt."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mellow_tpu.tools.convert_ckpt import *  # noqa: F401,F403,E402
from mellow_tpu.tools.convert_ckpt import _entry, main  # noqa: F401,E402

if __name__ == "__main__":
    main(sys.argv)
