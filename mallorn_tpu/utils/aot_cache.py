"""Persistent compiled-executable cache (AOT export/import).

The axon TPU tunnel forces remote compilation and bypasses JAX's
persistent compilation cache, so every fresh process pays the full
backend compile (~minutes for the 500-round boosting scan — PERF.md).
``jax.experimental.serialize_executable`` round-trips the compiled
PJRT executable through bytes, so we cache executables on disk keyed by
a hash of the *lowered HLO* (plus jax version and backend): any code or
shape change changes the HLO text and misses the cache; a fresh process
with unchanged code loads the executable and skips the backend compile
entirely.

Enabled when ``MALLORN_AOT_CACHE`` names a directory (bench.py sets it);
disabled = plain jitted call. Serialization failures degrade silently to
normal compilation — this is a cache, never a correctness layer.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from pathlib import Path
from typing import Any, Dict, Tuple

import jax

# in-process: (id of jitted fn, shape signature) -> loaded executable
_LOADED: Dict[Tuple, Any] = {}


def cache_dir() -> Path | None:
    d = os.environ.get("MALLORN_AOT_CACHE")
    return Path(d) if d else None


def _signature(args) -> Tuple:
    return tuple(
        (tuple(a.shape), str(a.dtype)) if hasattr(a, "shape") else repr(a)
        for a in jax.tree.leaves(args))


def call_cached(jitted, args: tuple, tag: str = "fn",
                static_argnums: tuple = ()):
    """Call a jitted function through the executable cache.

    Hot path: per-process memo hit -> zero overhead beyond a dict lookup.
    Cold path: lower (host tracing only), hash the HLO, then either load
    the serialized executable or compile + serialize it.

    ``static_argnums`` must mirror the jit's static argnums: a compiled
    executable is called with the traced arguments only.
    """
    d = cache_dir()
    if d is None:
        return jitted(*args)

    call_args = tuple(a for i, a in enumerate(args)
                      if i not in static_argnums)
    memo_key = (id(jitted), tag, _signature(args))
    ex = _LOADED.get(memo_key)
    if ex is None:
        ex = _load_or_compile(jitted, args, tag, d)
        _LOADED[memo_key] = ex
    return ex(*call_args)


def _load_or_compile(jitted, args, tag, d: Path):
    from jax.experimental import serialize_executable as se

    lowered = jitted.lower(*args)
    key = hashlib.sha256(
        (jax.__version__ + jax.default_backend()
         + lowered.as_text()).encode()).hexdigest()[:24]
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"{tag}_{key}.aotx"

    if path.exists():
        try:
            payload, in_tree, out_tree = pickle.loads(path.read_bytes())
            return se.deserialize_and_load(payload, in_tree, out_tree)
        except Exception:
            path.unlink(missing_ok=True)  # stale/incompatible: recompile

    compiled = lowered.compile()
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        tmp = path.with_suffix(".tmp")
        tmp.write_bytes(pickle.dumps((payload, in_tree, out_tree)))
        os.replace(tmp, path)
    except Exception:
        pass  # cache is best-effort
    return compiled
