"""Back-compat shims: the real tool modules live in ``mellow_tpu.tools``
(namespaced so the installed wheel does not ship a generic top-level
``tools`` package). Repo-internal ``tools.X`` imports keep working."""
