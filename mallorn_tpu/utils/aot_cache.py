"""Persistent compiled-executable cache (AOT export/import).

The axon TPU tunnel forces remote compilation and bypasses JAX's
persistent compilation cache, so every fresh process pays the full
backend compile (~minutes for the 500-round boosting scan — PERF.md).
``jax.experimental.serialize_executable`` round-trips the compiled PJRT
executable through bytes; we cache executables on disk keyed by

  (jax version, backend, call tag, argument tree/shape/dtype signature,
   a content hash of the whole mallorn_tpu package source)

The package-source hash is deliberately coarse: ANY source change
invalidates the entire cache. That conservatism buys the thing that
matters — a cache HIT costs only a file read + deserialize, with no
tracing/lowering (hashing the lowered HLO instead was correct-by-construction
but re-paid 10-30 s of host tracing per big scan, defeating the point).

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

# in-process: (id of jitted fn, tag, signature) -> loaded executable
_LOADED: Dict[Tuple, Any] = {}
_PKG_HASH: str | None = None


def cache_dir() -> Path | None:
    d = os.environ.get("MALLORN_AOT_CACHE")
    if not d:
        return None
    # TPU-only: XLA:CPU AOT executables bake in host machine features and
    # can SIGILL on reload (observed); CPU compiles are cheap anyway.
    if jax.default_backend() != "tpu":
        return None
    return Path(d)


def _package_hash() -> str:
    """Content hash of every .py file in the mallorn_tpu package."""
    global _PKG_HASH
    if _PKG_HASH is None:
        import mallorn_tpu

        root = Path(mallorn_tpu.__file__).parent
        h = hashlib.sha256()
        for p in sorted(root.rglob("*.py")):
            h.update(str(p.relative_to(root)).encode())
            h.update(p.read_bytes())
        _PKG_HASH = h.hexdigest()
    return _PKG_HASH


def _leaf_sig(a):
    if hasattr(a, "shape"):
        return (tuple(a.shape), str(getattr(a, "dtype", "?")))
    if callable(a):  # static callables (objectives): stable across processes
        return getattr(a, "__qualname__", repr(a))
    return repr(a)


def _signature(args) -> str:
    leaves, tree = jax.tree.flatten(args)
    return repr((tuple(_leaf_sig(a) for a in leaves), str(tree)))


def call_cached(jitted, args: tuple, tag: str = "fn",
                static_argnums: tuple = ()):
    """Call a jitted function through the executable cache.

    Hot path: per-process memo hit -> dict lookup + call. Cold path with
    a cache file: deserialize + load (no tracing, no compile). Cold path
    without: compile via the jit machinery, then serialize.

    ``static_argnums`` must mirror the jit's static argnums: a compiled
    executable is called with the traced arguments only.
    """
    d = cache_dir()
    if d is None:
        return jitted(*args)

    sig = _signature(args)
    memo_key = (id(jitted), tag, sig)
    ex = _LOADED.get(memo_key)
    if ex is None:
        ex = _load_or_compile(jitted, args, tag, sig, d)
        _LOADED[memo_key] = ex
    call_args = tuple(a for i, a in enumerate(args)
                      if i not in static_argnums)
    return ex(*call_args)


def _load_or_compile(jitted, args, tag, sig, d: Path):
    from jax.experimental import serialize_executable as se

    key = hashlib.sha256(
        (jax.__version__ + jax.default_backend() + tag + sig
         + _package_hash()).encode()).hexdigest()[:24]
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"{tag}_{key}.aotx"

    if path.exists():
        try:
            payload, in_tree, out_tree = pickle.loads(path.read_bytes())
            return se.deserialize_and_load(payload, in_tree, out_tree)
        except Exception:
            path.unlink(missing_ok=True)  # stale/incompatible: recompile

    compiled = jitted.lower(*args).compile()
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        tmp = path.with_suffix(".tmp")
        tmp.write_bytes(pickle.dumps((payload, in_tree, out_tree)))
        os.replace(tmp, path)
    except Exception:
        pass  # cache is best-effort
    return compiled
