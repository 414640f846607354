"""Persistent compiled-executable cache (AOT export/import).

The axon TPU tunnel forces remote compilation and bypasses JAX's
persistent compilation cache, so every fresh process pays the full
backend compile (~minutes for the 500-round boosting scan — PERF.md).
``jax.experimental.serialize_executable`` round-trips the compiled PJRT
executable through bytes; we cache executables on disk keyed by

  (jax version, backend, call tag, argument tree/shape/dtype signature,
   a content hash of the package sources the tag's subsystem depends on)

The source hash is per-SUBSYSTEM (bucket), not per-package: a ``gbdt_*``
executable is keyed on ``trees/ + ops/ + utils/``, a ``feat_*``/``gp2d``
one on ``features/ + ops/ + data/ + utils/`` (mesh variants add
``parallel/``), so a perf edit in the tree layer no longer invalidates
the ~200 MB of feature/GP executables (or vice versa) — on the axon
relay, re-uploading those costs ~25 s of cold start. Buckets are
deliberately superset-conservative (all of ``ops/`` and ``utils/`` in
both); unrecognized tags fall back to the whole-package hash. Content
hashing stays file-based, never HLO-based: a cache HIT must cost only a
file read + deserialize, with no tracing/lowering (hashing the lowered
HLO was correct-by-construction but re-paid 10-30 s of host tracing per
big scan, defeating the point).

Enabled when ``MALLORN_AOT_CACHE`` names a directory (bench.py sets it);
disabled = plain jitted call. Serialization failures degrade silently to
normal compilation — this is a cache, never a correctness layer.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import threading
from pathlib import Path
from typing import Any, Dict, Tuple

import jax

# in-process: (id of jitted fn, tag, signature) -> loaded executable
_LOADED: Dict[Tuple, Any] = {}
_PKG_HASH: str | None = None
# path -> deserialized executable (or Future thereof), filled by prefetch()
_PREFETCHED: Dict[str, Any] = {}
_PREFETCH_LOCK = threading.Lock()


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
        _PKG_HASH = _dirs_hash(None)
    return _PKG_HASH


_DIR_HASHES: Dict[Tuple, str] = {}

# tag prefix -> package subdirectories whose sources determine the
# compiled computation. native .cpp sources are irrelevant (host-side),
# train/ cli/ io/ models/ only orchestrate around the jitted fns.
_BUCKETS = (
    (("gbdt",), ("trees", "ops", "utils")),
    (("feat_", "gp2d"), ("features", "ops", "data", "utils")),
)


def _dirs_hash(dirs: tuple | None) -> str:
    """Content hash of the package's .py files under ``dirs`` (all when
    None); top-level modules (__init__ etc.) always included."""
    key = dirs
    got = _DIR_HASHES.get(key)
    if got is not None:
        return got
    import mallorn_tpu

    root = Path(mallorn_tpu.__file__).parent
    h = hashlib.sha256()
    for p in sorted(root.rglob("*.py")):
        rel = p.relative_to(root)
        if dirs is not None and len(rel.parts) > 1 and rel.parts[0] not in dirs:
            continue
        # the cache/profiling machinery never affects compiled
        # computations; editing it must not invalidate every bucket
        # (utils/ is in all of them — a wiped cache costs a full
        # remote re-prime on the tunnel)
        if rel.parts[-1] in ("aot_cache.py", "profiling.py"):
            continue
        h.update(str(rel).encode())
        h.update(p.read_bytes())
    _DIR_HASHES[key] = h.hexdigest()
    return _DIR_HASHES[key]


def _bucket_id(tag: str) -> str:
    for prefixes, _ in _BUCKETS:
        if tag.startswith(prefixes):
            base = prefixes[0].rstrip("_")
            return f"{base}mesh" if "mesh" in tag else base
    return "full"


def _bucket_hash(bucket: str) -> str:
    """The source hash executables in this bucket are keyed on."""
    for prefixes, dirs in _BUCKETS:
        base = prefixes[0].rstrip("_")
        if bucket == base:
            return _dirs_hash(tuple(sorted(dirs)))
        if bucket == f"{base}mesh":  # shard_map wrappers live in parallel/
            return _dirs_hash(tuple(sorted(dirs + ("parallel",))))
    return _package_hash()


def _all_buckets() -> tuple:
    out = ["full"]
    for prefixes, _ in _BUCKETS:
        base = prefixes[0].rstrip("_")
        out += [base, f"{base}mesh"]
    return tuple(out)


def _leaf_sig(a):
    if hasattr(a, "shape"):
        # input sharding is compiled into the executable: a mesh-placed
        # array must not share a cache entry with a single-device one
        sh = getattr(a, "sharding", None)
        s = "" if sh is None else (
            f"{type(sh).__name__}:{getattr(sh, 'spec', '')}")
        return (tuple(a.shape), str(getattr(a, "dtype", "?")), s)
    if callable(a):  # static callables (objectives): stable across processes
        return getattr(a, "_cache_key", getattr(a, "__qualname__", repr(a)))
    return repr(a)


def _signature(args) -> str:
    leaves, tree = jax.tree.flatten(args)
    return repr((tuple(_leaf_sig(a) for a in leaves), str(tree)))


_TAG_SUFFIX = ""


class tag_suffix:
    """Context manager appending a suffix to every call_cached tag inside.

    Used by the sharded (mesh) pipeline so its executables get distinct
    cache files from the single-device ones (their argument shardings
    already force distinct signatures) AND recognizable names: prefetch
    deliberately skips ``mesh`` files — uploading them through the tunnel
    ahead of the primary pipeline's would starve the cold pass (the
    relay moves executable payloads at ~5-10 MB/s, serially)."""

    def __init__(self, suffix: str):
        self.suffix = suffix

    def __enter__(self):
        global _TAG_SUFFIX
        self._prev = _TAG_SUFFIX
        _TAG_SUFFIX = _TAG_SUFFIX + self.suffix
        return self

    def __exit__(self, *exc):
        global _TAG_SUFFIX
        _TAG_SUFFIX = self._prev
        return False


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

    # under an OUTER trace (e.g. the flagship serving graph jits a full
    # extraction->forest forward that calls cached extractors), a
    # compiled executable cannot consume tracers — inline the jitted fn
    # so it traces into the outer graph instead
    from jax._src import core as _core

    if any(isinstance(l, _core.Tracer) for l in jax.tree.leaves(args)):
        return jitted(*args)

    tag = tag + _TAG_SUFFIX
    # (tag, sig) fully determines the executable (tags carry a digest of
    # any closed-over static config — _folds_cache_tag); keying off
    # id(jitted) would defeat the memo for freshly-built jit wrappers
    sig = _signature(args)
    memo_key = (tag, sig)
    ex = _LOADED.get(memo_key)
    if ex is None:
        ex = _load_or_compile(jitted, args, tag, sig, d)
        _LOADED[memo_key] = ex
    call_args = tuple(a for i, a in enumerate(args)
                      if i not in static_argnums)
    return ex(*call_args)


def config_digest(*parts) -> str:
    """Short stable digest of static config closed over by a jitted fn.

    Mix this into the ``tag`` whenever the compiled computation depends on
    values that are NOT traced arguments (e.g. a GBDTParams closed over by
    a vmapped fit): two same-shaped calls with different static config must
    never share a cache file."""
    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"\x00")
    return h.hexdigest()[:10]


def _deserialize(path: Path):
    from jax.experimental import serialize_executable as se

    payload, in_tree, out_tree = pickle.loads(path.read_bytes())
    return se.deserialize_and_load(payload, in_tree, out_tree)


def _manifest_path(d: Path, bucket: str) -> Path:
    return d / f"manifest_{bucket}_{_bucket_hash(bucket)[:16]}.txt"


def _manifest_add(d: Path, name: str, tag: str) -> None:
    """Record a file as belonging to its bucket's current generation (the
    cache key embeds the argument signature, which prefetch can't predict;
    the manifest is how a LATER process knows which files are current)."""
    try:
        mp = _manifest_path(d, _bucket_id(tag))
        known = set(mp.read_text().split()) if mp.exists() else set()
        if name not in known:
            with open(mp, "a") as f:
                f.write(name + "\n")
    except Exception:
        pass


def prefetch(max_workers: int = 4, prune_stale: bool = True,
             mesh: bool = False) -> None:
    """Deserialize + device-load the current generation's executables on
    background threads, so the pipeline's first call per tag finds them
    ready instead of paying the load serially (first-call executable loads
    through the tunnel are most of the cold-warm gap).

    Only files listed in the current package hash's manifest are loaded —
    a fresh generation (post-source-edit) has no manifest yet and
    prefetches nothing. ``prune_stale``: once a current manifest exists,
    unreferenced .aotx files from older generations are deleted.
    """
    d = cache_dir()
    if d is None or not d.is_dir():
        return
    current = {b: _manifest_path(d, b) for b in _all_buckets()}
    names: set = set()
    for mp in current.values():
        if mp.exists():
            names |= set(mp.read_text().split())
    if not names:
        return

    if prune_stale:
        for p in d.glob("*.aotx"):
            if p.name not in names:
                p.unlink(missing_ok=True)
        keep = {m for m in current.values()}
        for m in d.glob("manifest_*.txt"):
            if m not in keep:
                m.unlink(missing_ok=True)

    # pipeline order: the relay uploads executables serially at ~5-10
    # MB/s, so the queue order IS the cold-start order. Mesh (sharded-
    # pass) executables are excluded entirely — that pass runs last and
    # loads on demand.
    # FINE-GRAINED pipeline order: within the feature stage the pipeline
    # runs statistical -> colors -> shape -> physics -> (stack) -> tde ->
    # gp2d -> bazin; a coarse "feat_" rank sorted alphabetically put the
    # big bazin executable FIRST and its ~13 s upload blocked the
    # families the cold pass needed immediately (round-5 cold trace).
    _PRIORITY = ("feat_statistical", "feat_colors", "feat_shape",
                 "feat_physics", "feat_stack", "feat_tde", "gp2d",
                 "feat_", "gbdt_stackbin", "gbdt_folds",
                 "gbdt_predict", "gbdt_fit")

    def _rank(name: str) -> int:
        for i, pre in enumerate(_PRIORITY):
            if name.startswith(pre):
                return i
        return len(_PRIORITY)

    # mesh=False: the primary pipeline's files, mesh files excluded (the
    # sharded pass runs last). mesh=True: ONLY the mesh files — called
    # right before the sharded pass so its uploads overlap host-side
    # work (e.g. the sklearn oracle) instead of its own timing.
    paths = [d / n for n in sorted(names, key=lambda n: (_rank(n), n))
             if ("mesh" in n) == mesh and (d / n).exists()]

    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=max_workers,
                              thread_name_prefix="aot-prefetch")

    def load(p: Path):
        try:
            return _deserialize(p)
        except Exception:
            return None

    with _PREFETCH_LOCK:
        for p in paths:
            if str(p) not in _PREFETCHED:
                _PREFETCHED[str(p)] = pool.submit(load, p)
    pool.shutdown(wait=False)


_WARMED: set = set()


def _dummy_args(ex):
    """Zero-filled arguments matching a loaded executable's input avals.

    ``jnp.zeros`` lowers to a device-side broadcast fill (no host->device
    payload), so building dummy inputs is cheap even for wide fit
    matrices."""
    import jax.numpy as jnp

    args, kwargs = jax.tree.map(
        lambda i: jnp.zeros(i.shape, i.dtype), ex.args_info)
    return args, kwargs


def warmup_uploads(block_each: bool = True) -> None:
    """Force the relay's deferred executable uploads NOW (cold start).

    The axon PJRT client uploads executable payloads to the TPU server
    lazily — at FIRST EXECUTION, not at deserialize/load — and serially
    at ~5-10 MB/s, so each pipeline stage's first call stalls on its own
    executables' uploads and nothing overlaps (PERF.md round-3 cold-start
    decomposition). This dispatches ONE dummy zeros-argument call per
    prefetched executable, in prefetch (pipeline) order, on a background
    thread: the uploads start immediately and stream while the process is
    still doing host prep (data load/synth, binning) and while earlier
    stages compute, instead of serializing into every stage's first real
    call.

    Correctness: dummy outputs are discarded; the loaded executable
    object is stored back into the prefetch table so the pipeline's
    ``call_cached`` reuses the SAME loaded executable (a re-deserialized
    copy would re-upload). Dummy device work is bounded — zero inputs
    drive early-stopping fits to their minimum round count and fixed-
    iteration kernels run once. ``block_each``: wait for each dummy call
    before dispatching the next, so real work dispatched meanwhile
    interleaves between dummy calls instead of queueing behind all of
    them (also bounds dummy buffer memory to one call)."""
    with _PREFETCH_LOCK:
        items = [(p, f) for p, f in _PREFETCHED.items() if p not in _WARMED]
        _WARMED.update(p for p, _ in items)
    if not items:
        return

    import sys
    import time as _time

    timers = os.environ.get("MALLORN_TIMERS")

    def run():
        for path, fut in items:
            try:
                ex = fut.result() if hasattr(fut, "result") else fut
                if ex is None:
                    continue
                with _PREFETCH_LOCK:
                    # future -> resolved value; call_cached picks up the
                    # identical (already-uploading) executable
                    if path in _PREFETCHED:
                        _PREFETCHED[path] = ex
                t0 = _time.perf_counter()
                args, kwargs = _dummy_args(ex)
                out = ex(*args, **kwargs)
                if block_each:
                    jax.block_until_ready(out)
                del out
                if timers:
                    print(f"      [aot] warmup {Path(path).name[:40]}: "
                          f"{_time.perf_counter() - t0:.2f}s",
                          file=sys.stderr, flush=True)
            except Exception:
                continue

    threading.Thread(target=run, name="aot-warmup", daemon=True).start()


def _take_prefetched(path: Path):
    with _PREFETCH_LOCK:
        got = _PREFETCHED.pop(str(path), None)
    if got is None:
        return None
    try:
        return got.result() if hasattr(got, "result") else got
    except Exception:
        return None


def _load_or_compile(jitted, args, tag, sig, d: Path):
    from jax.experimental import serialize_executable as se

    key = hashlib.sha256(
        (jax.__version__ + jax.default_backend() + tag + sig
         + _bucket_hash(_bucket_id(tag))).encode()).hexdigest()[:24]
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"{tag}_{key}.aotx"

    import sys
    import time as _time

    timers = os.environ.get("MALLORN_TIMERS")
    if path.exists():
        _manifest_add(d, path.name, tag)
        t0 = _time.perf_counter()
        ex = _take_prefetched(path)
        if ex is not None:
            if timers:
                print(f"      [aot] {tag}: prefetched "
                      f"(waited {_time.perf_counter() - t0:.2f}s)",
                      file=sys.stderr, flush=True)
            return ex
        try:
            ex = _deserialize(path)
            if timers:
                print(f"      [aot] {tag}: load "
                      f"{_time.perf_counter() - t0:.2f}s "
                      f"({path.stat().st_size / 1e6:.0f} MB)",
                      file=sys.stderr, flush=True)
            return ex
        except Exception:
            path.unlink(missing_ok=True)  # stale/incompatible: recompile

    t0 = _time.perf_counter()
    compiled = jitted.lower(*args).compile()
    if timers:
        print(f"      [aot] {tag}: COMPILE {_time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        tmp = path.with_suffix(".tmp")
        tmp.write_bytes(pickle.dumps((payload, in_tree, out_tree)))
        os.replace(tmp, path)
        _manifest_add(d, path.name, tag)
    except Exception:
        pass  # cache is best-effort
    return compiled
