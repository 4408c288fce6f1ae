"""Persistent executable cache for the engine's compiled programs.

The flat whole-network Pallas kernel costs minutes of Mosaic+XLA compile
per model; JAX's persistent compilation cache (keyed on the HLO, which
includes the serialized Mosaic kernel) makes any repeat compile of the
same program a disk hit.  This is the TPU analog of the reference
crate's build cache: the macro expansion happens once per `cargo build`
and is reused until the model or code changes.

Two layers:

* ``enable_compile_cache`` points JAX's own persistent compilation
  cache at a repo-local directory.  Its key hashes the serialized
  XLA ``compile_options``, which we measured drifting across backend
  sessions on relayed TPU targets (identical programs produced
  distinct keys minutes apart) -- so it hits often but not always.
* ``cached_executable`` is the engine's own executable cache, keyed
  ONLY on the client-side lowered HLO text + device kind + jaxlib
  version (measured byte-stable across processes).  It serializes the
  compiled executable via ``jax.experimental.serialize_executable``
  and falls back to a fresh compile on any load/compat failure.

Opt-in because the cache directory is process-global JAX config.
"""

from __future__ import annotations

import hashlib
import os
import struct


def enable_compile_cache(path: str | None = None, min_compile_secs: float = 10.0) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``MFT_CACHE_DIR`` or ``<repo>/.jax_cache``).  Returns the directory
    used.  Safe to call more than once; later calls re-point the cache.

    Also excludes Python tracebacks from MLIR locations: Pallas kernels
    embed the caller's trace stack in their Mosaic payload, so with
    tracebacks on, an unrelated line shift in any calling file changes
    the lowered bytes and misses the cache (measured; see
    ``cached_executable``).  The cost is less precise source locations
    in compiler dumps -- acceptable when opting into caching."""
    import jax

    if path is None:
        path = _default_dir()
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    jax.config.update("jax_include_full_tracebacks_in_locations", False)
    return path


def _default_dir() -> str:
    env = os.environ.get("MFT_CACHE_DIR")
    if env:
        return env
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )


def cached_executable(fn, *args, name: str = "fn", path: str | None = None,
                      devices=None):
    """Compile ``jax.jit(fn)`` for exactly these ``args`` with an
    executable-level persistent cache.

    The key is the client-side lowered HLO (byte-stable across
    processes; sharding annotations included, so a sharded program
    keys separately) + device topology + jaxlib version --
    deliberately NOT the XLA compile options, whose serialized form
    drifts across relayed backend sessions and defeats JAX's own
    persistent-cache key.

    ``fn`` may be a plain function or an existing ``jax.jit`` wrapper
    (e.g. one carrying in/out shardings); ``devices`` pins execution
    devices on load (default: device 0 -- pass the flattened mesh
    devices for a sharded program).

    Returns a ``jax.stages.Compiled``: call it with the same tree
    structure / shapes / dtypes as ``args`` (shape-specialized, like
    the reference's monomorphized ``model!`` expansion).  Any
    serialize/deserialize failure falls back to a fresh compile.
    """
    import jax
    from jax.experimental import serialize_executable as se

    jitfn = fn if hasattr(fn, "lower") else jax.jit(fn)
    # Pallas kernels embed the full trace stack in their serialized
    # Mosaic payload, so an unrelated caller-side line shift changes
    # the lowered bytes (measured: same program, different md5).
    # Lower with tracebacks excluded from locations to make the key a
    # function of the program alone.
    prev = jax.config.jax_include_full_tracebacks_in_locations
    jax.config.update("jax_include_full_tracebacks_in_locations", False)
    try:
        lowered = jitfn.lower(*args)
    finally:
        jax.config.update("jax_include_full_tracebacks_in_locations", prev)
    devs = list(devices) if devices is not None else [jax.devices()[0]]
    topo = ",".join(d.device_kind for d in devs)
    key = hashlib.sha256(
        (jax.lib.__version__ + "\0" + topo + "\0").encode()
        + lowered.as_text().encode()
    ).hexdigest()[:40]
    cdir = path or _default_dir()
    try:
        os.makedirs(cdir, exist_ok=True)
    except OSError:
        return lowered.compile()  # read-only deployment: no cache
    fpath = os.path.join(cdir, f"exe_{name}-{key}")
    if os.path.exists(fpath):
        try:
            with open(fpath, "rb") as f:
                payload, in_tree, out_tree = _decode_entry(f.read())
            # touch on hit so _prune_executables approximates LRU --
            # mtime-only eviction is FIFO and can drop the hottest
            # (slowest-to-compile) entry under churn
            try:
                os.utime(fpath)
            except OSError:
                pass
            # pin execution devices: the loader otherwise spreads over
            # every local device (wrong under a forced multi-device
            # host when the program was compiled single-device)
            return se.deserialize_and_load(payload, in_tree, out_tree,
                                           execution_devices=devs)
        except Exception:
            pass  # stale/incompatible entry: recompile below
    compiled = lowered.compile()
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        tmp = fpath + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(_encode_entry(payload, in_tree, out_tree))
        os.replace(tmp, fpath)
        _prune_executables(cdir)
    except Exception:
        pass  # backend without executable serialization: cache skipped
    return compiled


# Cache entries hold three byte blobs: the serialized executable payload
# and the two PyTreeDefs as protos (jaxlib's serialize_using_proto).
# Deliberately NOT pickle: the cache dir is repo-local (or user-pointed
# via MFT_CACHE_DIR), and a pickle loader would hand anyone who can
# write there arbitrary code execution in every process that warms --
# the same reason JAX's own persistent cache avoids pickle.
_ENTRY_MAGIC = b"MFTX1\0"


def _encode_entry(payload: bytes, in_tree, out_tree) -> bytes:
    blobs = (bytes(payload), in_tree.serialize_using_proto(),
             out_tree.serialize_using_proto())
    out = [_ENTRY_MAGIC]
    for b in blobs:
        out.append(struct.pack("<Q", len(b)))
        out.append(b)
    return b"".join(out)


def _decode_entry(data: bytes):
    if not data.startswith(_ENTRY_MAGIC):
        raise ValueError("not a cache entry (pre-round-4 pickle format?)")
    from jax import tree_util as tu

    off = len(_ENTRY_MAGIC)
    blobs = []
    for _ in range(3):
        (n,) = struct.unpack_from("<Q", data, off)
        off += 8
        blobs.append(data[off : off + n])
        off += n
    treedef_cls = type(tu.tree_structure(0))
    return (blobs[0],
            treedef_cls.deserialize_using_proto(tu.default_registry, blobs[1]),
            treedef_cls.deserialize_using_proto(tu.default_registry, blobs[2]))


_MAX_EXECUTABLES = 24  # ~100 MB each for the flat kernel: cap ~2.5 GB


def _prune_executables(cdir: str) -> None:
    """Drop the oldest exe_* entries beyond the cap (stale program
    versions accumulate one ~100 MB file per code change otherwise)."""
    try:
        entries = [os.path.join(cdir, e) for e in os.listdir(cdir)
                   if e.startswith("exe_") and ".tmp" not in e]
        entries.sort(key=os.path.getmtime)
        for stale in entries[:-_MAX_EXECUTABLES]:
            os.unlink(stale)
    except OSError:
        pass
