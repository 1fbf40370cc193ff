"""AOT-serialized serving executables (VERDICT r4 #2).

The single-shape serving path (predict.py ``+pad_tail_to_chunk=1``)
compiles exactly one executable per (config, chunk shape, precision).
The XLA persistent compile cache already skips the *compile*, but a warm
predict still pays a full Python re-trace plus cache lookup every
process start (measured 13.9 s of warmup ON a cache hit — PERF.md
"Cold-start predict"). This module serializes the PJRT executable itself
(``jax.experimental.serialize_executable``) so a warm start skips trace
AND compile: deserialize (milliseconds) and run.

Safety: the cache key covers the jax version, backend platform + device
kind, a signature of the entire ``aero_tpu`` source tree (an executable
must never silently serve stale model code), and the caller's tag
(config + input avals). Any load failure falls back to the normal
trace+compile path — this is strictly a fast path.

The reference counterpart is the load-once, infer-fast serving contract
of /root/reference/predict.py:41-94 (torch has no trace/compile stage to
skip; on TPU this is the equivalent mechanism).
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import typing as tp

import jax

logger = logging.getLogger(__name__)

_CODE_SIG: str | None = None


def code_signature() -> str:
    """Fingerprint of the aero_tpu source tree (path, size, mtime_ns).

    Cheap (one stat per file) and conservative: any edit anywhere in the
    package invalidates serialized executables, because an executable
    baked from an old trace would otherwise silently ignore code changes
    — the one failure mode a compile cache must never have."""
    global _CODE_SIG
    if _CODE_SIG is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for name in sorted(filenames):
                if not name.endswith(".py"):
                    continue
                p = os.path.join(dirpath, name)
                st = os.stat(p)
                h.update(f"{os.path.relpath(p, root)}:{st.st_size}:"
                         f"{st.st_mtime_ns}\n".encode())
        _CODE_SIG = h.hexdigest()[:16]
    return _CODE_SIG


def _avals_repr(args) -> str:
    leaves, treedef = jax.tree.flatten(args)
    shapes = ";".join(f"{getattr(x, 'shape', ())}/"
                      f"{getattr(x, 'dtype', type(x).__name__)}"
                      for x in leaves)
    return f"{treedef}|{shapes}"


def cache_path(aot_dir: str, tag: str, args) -> str:
    dev = jax.devices()[0]
    key = "|".join([
        jax.__version__,
        f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"
        f":n{jax.device_count()}",
        code_signature(),
        tag,
        _avals_repr(args),
    ])
    return os.path.join(aot_dir,
                        hashlib.sha256(key.encode()).hexdigest() + ".aotx")


def load_compiled(path: str) -> tp.Any | None:
    """Deserialize a compiled executable; None on ANY failure (missing,
    version skew, device mismatch) — callers fall back to trace+compile."""
    from jax.experimental import serialize_executable as se

    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            payload, in_tree, out_tree, n_dev = pickle.load(f)
        # deserialize_and_load defaults to the client's FULL device set;
        # a 1-device serving executable under a multi-device client must
        # pin its original device count or execution rejects the args
        compiled = se.deserialize_and_load(
            payload, in_tree, out_tree,
            execution_devices=jax.devices()[:n_dev])
        logger.info(f"AOT executable loaded from {path}")
        return compiled
    except Exception as e:  # noqa: BLE001 — strictly a fast path
        logger.info(f"AOT load failed ({e}); falling back to compile")
        return None


def save_compiled(path: str, compiled) -> None:
    """Serialize atomically; failures are logged, never raised."""
    from jax.experimental import serialize_executable as se

    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        try:
            n_dev = len(
                compiled._executable.xla_executable.local_devices())
        except Exception:  # noqa: BLE001 — single-device serving default
            n_dev = 1
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree, n_dev), f)
        os.replace(tmp, path)
        logger.info(f"AOT executable serialized to {path}")
    except Exception as e:  # noqa: BLE001
        logger.info(f"AOT serialize failed ({e}); cache not written")


def _verify_executes(compiled, args) -> bool:
    """Run the deserialized executable once and force a host fetch of one
    output leaf. Some backends (XLA:CPU's AOT loader, notably) accept a
    deserialized executable but fail at buffer materialization
    ("Buffer Definition Event ... not found"); catching that here turns a
    crash-at-first-use into a clean recompile."""
    try:
        out = compiled(*args)
        leaf = jax.tree.leaves(out)[0]
        float(jax.numpy.sum(leaf[(0,) * leaf.ndim]
                            if leaf.ndim else leaf).astype(jax.numpy.float32))
        return True
    except Exception as e:  # noqa: BLE001
        logger.info(f"AOT executable failed verification ({e}); recompiling")
        return False


def get_or_compile(fn, args: tuple, aot_dir: str, tag: str):
    """Return a callable for ``fn(*args)``'s shape signature: the
    deserialized AOT executable on a hit (verified by one throwaway
    execution — predict.py's warmup call, moved inside the loader), else
    jit(fn).lower(...).compile() (serialized for next time)."""
    path = cache_path(aot_dir, tag, args)
    compiled = load_compiled(path)
    if compiled is not None:
        if _verify_executes(compiled, args):
            return compiled
        try:
            os.remove(path)  # stale/unloadable: never retry it
        except OSError:
            pass
    jitted = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
    compiled = jitted.lower(*args).compile()
    save_compiled(path, compiled)
    return compiled


def default_aot_dir() -> str:
    from aero_tpu.utils.platform import cache_dir_for

    base = os.environ.get("AERO_AOT_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "aero_tpu", "aot")
    return cache_dir_for(base)
