"""Native (C) accelerators for the host-side input pipeline.

``load_fastjpeg()`` compiles and loads ``fastjpeg.c`` on first use (g++ +
libjpeg, both baked into the target image) and returns the module, or None
when the toolchain/library is unavailable — every caller must keep the pure
PIL path as fallback. The compiled .so is cached next to the source keyed by
a content hash, so rebuilds happen only when the C source changes.
"""
from __future__ import annotations

import hashlib
import importlib.util
import logging
import os
import subprocess
import sysconfig
from functools import lru_cache
from typing import Optional

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastjpeg.c")


@lru_cache()
def load_fastjpeg():
    if os.environ.get("LATTECLIP_DISABLE_NATIVE", "0") == "1":
        return None
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:12]
        so_path = os.path.join(_DIR, f"_fastjpeg_{digest}.so")
        if not os.path.exists(so_path):
            include = sysconfig.get_paths()["include"]
            cmd = [
                "g++", "-O3", "-shared", "-fPIC", "-std=c11", "-x", "c",
                _SRC, f"-I{include}", "-ljpeg", "-o", so_path,
            ]
            result = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
            if result.returncode != 0:
                logger.warning("fastjpeg build failed: %s", result.stderr[-400:])
                return None
        spec = importlib.util.spec_from_file_location("_fastjpeg", so_path)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        return module
    except Exception as e:  # any failure -> pure-python fallback
        logger.warning("fastjpeg unavailable: %s", e)
        return None
