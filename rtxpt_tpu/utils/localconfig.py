"""Local developer config overrides (reference LocalConfig.h analog).

The reference compiles in an optional LocalConfig hook so a developer
machine can override sample defaults without touching committed code.
TPU analog: a JSON file of CLI-default overrides, looked up at
`$RTXPT_TPU_LOCAL_CONFIG` or `./rtxpt_tpu.local.json`, applied AFTER
parsing but only to flags the user did not pass explicitly — command
line always wins, exactly like the reference's
`LocalConfig::PostProcessCommandLine` ordering.

Example rtxpt_tpu.local.json:
    {"width": 960, "height": 540, "denoiser": "reblur", "spp": 4}
"""

from __future__ import annotations

import json
import os
import sys
from typing import Optional


def local_config_path() -> Optional[str]:
    p = os.environ.get("RTXPT_TPU_LOCAL_CONFIG")
    if p and os.path.exists(p):
        return p
    if os.path.exists("rtxpt_tpu.local.json"):
        return "rtxpt_tpu.local.json"
    return None


def apply_local_config(args, argv=None, path: Optional[str] = None):
    """Mutate parsed `args` with overrides for flags absent from argv.
    Returns the list of (key, value) overrides applied."""
    path = path or local_config_path()
    if path is None:
        return []
    with open(path) as f:
        overrides = json.load(f)
    argv = argv if argv is not None else sys.argv[1:]
    explicit = {a.split("=")[0].lstrip("-").replace("-", "_")
                for a in argv if a.startswith("--")}
    applied = []
    for key, value in overrides.items():
        attr = key.replace("-", "_")
        if attr in explicit or not hasattr(args, attr):
            continue
        setattr(args, attr, value)
        applied.append((attr, value))
    return applied
