"""AOT executable cache: skip tracing, lowering AND compilation on repeat
runs of a known program.

JAX's persistent compilation cache only short-circuits the XLA compile
step; the host-side trace + StableHLO lowering of a large program (the
scan Kalman filter's 16-stage unrolled RK89 x 21x21 harmonics graph takes
~5 minutes of pure Python/MLIR work) is paid again by every process. This
cache pickles the *compiled executable*
(`jax.experimental.serialize_executable`) keyed by

  * jax/jaxlib version and backend platform + device kind,
  * a hash of every ``nyx_tpu`` source file (any code change invalidates),
  * a caller-provided fingerprint of everything baked into the traced
    program as a closure constant (station tables, gravity coefficients,
    integrator options, ...),
  * the shapes/dtypes of the example arguments,

so a warm process deserializes in milliseconds and goes straight to
execution. Failures at any stage (unsupported executable, version drift,
corrupt file) silently fall back to the normal jit path — the cache is a
pure accelerator, never a correctness dependency.
"""

from __future__ import annotations

import hashlib
import pickle
from pathlib import Path
from typing import Any, Callable, Optional

import numpy as np

_CODE_HASH: Optional[str] = None


def code_hash() -> str:
    """Hash of all nyx_tpu source files (computed once per process)."""
    global _CODE_HASH
    if _CODE_HASH is None:
        h = hashlib.sha256()
        root = Path(__file__).resolve().parent
        for p in sorted(root.rglob("*.py")):
            h.update(p.relative_to(root).as_posix().encode())
            h.update(p.read_bytes())
        _CODE_HASH = h.hexdigest()
    return _CODE_HASH


def fingerprint(obj: Any) -> bytes:
    """Stable byte fingerprint of a pytree of arrays / scalars / strings /
    dataclass configs. Arrays hash by dtype+shape+contents."""
    import jax

    h = hashlib.sha256()

    def _upd(x):
        if isinstance(x, (np.ndarray, np.generic)) or hasattr(x, "dtype"):
            a = np.asarray(x)
            h.update(str(a.dtype).encode())
            h.update(str(a.shape).encode())
            h.update(np.ascontiguousarray(a).tobytes())
        else:
            h.update(repr(x).encode())

    leaves, treedef = jax.tree_util.tree_flatten(obj)
    h.update(str(treedef).encode())
    for leaf in leaves:
        _upd(leaf)
    return h.digest()


def deep_fingerprint(obj: Any) -> bytes:
    """Fingerprint an arbitrary object graph (dataclasses, dicts,
    sequences, arrays, scalars) by structural recursion — used to cover
    everything a traced program closes over (gravity tables, station
    coordinates, tableaus, options...)."""
    import dataclasses

    h = hashlib.sha256()
    seen = set()

    def walk(x, depth=0):
        if depth > 12:
            h.update(b"<deep>")
            return
        if isinstance(x, (np.ndarray, np.generic)) or (
            hasattr(x, "dtype") and hasattr(x, "shape")
        ):
            a = np.asarray(x)
            h.update(str(a.dtype).encode())
            h.update(str(a.shape).encode())
            h.update(np.ascontiguousarray(a).tobytes())
        elif isinstance(x, (str, bytes, int, float, bool, type(None))):
            h.update(repr(x).encode())
        elif callable(x) and hasattr(x, "__qualname__"):
            # functions/classes by qualified name — their repr embeds a
            # memory address, which changes every process
            h.update(
                f"{getattr(x, '__module__', '')}.{x.__qualname__}".encode()
            )
        elif isinstance(x, dict):
            for k in sorted(x, key=repr):
                h.update(repr(k).encode())
                walk(x[k], depth + 1)
        elif isinstance(x, (list, tuple)):
            h.update(f"seq{len(x)}".encode())
            for v in x:
                walk(v, depth + 1)
        elif dataclasses.is_dataclass(x) and not isinstance(x, type):
            if id(x) in seen:
                return
            seen.add(id(x))
            h.update(type(x).__name__.encode())
            for f in dataclasses.fields(x):
                h.update(f.name.encode())
                walk(getattr(x, f.name), depth + 1)
        else:
            if id(x) in seen:
                return
            seen.add(id(x))
            h.update(type(x).__name__.encode())
            d = getattr(x, "__dict__", None)
            if d:
                walk(d, depth + 1)
            # no __dict__: type name only — a repr here would embed the
            # instance's memory address and make the key differ in every
            # process (observed: identical configs producing a fresh
            # 750 MB cache entry per run)

    walk(obj)
    return h.digest()


def _key(extra_fingerprint: bytes, example_args,
         compiler_options: Optional[dict] = None) -> str:
    import jax

    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    dev = jax.devices()[0]
    h.update(dev.platform.encode())
    h.update(getattr(dev, "device_kind", "?").encode())
    h.update(code_hash().encode())
    h.update(extra_fingerprint)
    # optimization effort changes fusion/scheduling and hence rounding;
    # executables at different efforts must not alias
    h.update(repr(sorted((compiler_options or {}).items())).encode())
    for leaf in jax.tree_util.tree_leaves(example_args):
        h.update(str(getattr(leaf, "dtype", type(leaf))).encode())
        h.update(str(getattr(leaf, "shape", ())).encode())
    return h.hexdigest()[:32]


def get_or_compile(
    cache_dir,
    name: str,
    jitted: Callable,
    example_args: tuple,
    config_fingerprint: bytes = b"",
    compiler_options: Optional[dict] = None,
) -> Callable:
    """Return a compiled callable for `jitted` at `example_args`' shapes,
    loading it from `cache_dir` when possible and saving it after a fresh
    compile. Falls back to the plain jitted callable on any failure."""
    import jax

    cache_dir = Path(cache_dir)
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        path = cache_dir / (
            f"{name}-{_key(config_fingerprint, example_args, compiler_options)}.aot"
        )
    except Exception:  # noqa: BLE001 — unusable cache dir
        return jitted

    if path.exists():
        try:
            from jax.experimental import serialize_executable as se

            blob, in_tree, out_tree = pickle.loads(path.read_bytes())
            return se.deserialize_and_load(blob, in_tree, out_tree)
        except Exception:  # noqa: BLE001 — stale/corrupt: recompile
            try:
                path.unlink()
            except OSError:
                pass

    compiled = jitted.lower(*example_args).compile(
        compiler_options=compiler_options
    )
    try:
        from jax.experimental import serialize_executable as se

        blob, in_tree, out_tree = se.serialize(compiled)
        tmp = path.with_suffix(".tmp")
        tmp.write_bytes(pickle.dumps((blob, in_tree, out_tree)))
        tmp.replace(path)
        _prune(cache_dir, name, keep=2)
    except Exception:  # noqa: BLE001 — executable not serializable: still
        pass  # return the freshly compiled one
    return compiled


def _prune(cache_dir: Path, name: str, keep: int = 2):
    """Drop all but the newest `keep` entries for `name` — executables are
    ~750 MB each and stale keys (old code revisions) never hit again."""
    entries = sorted(
        cache_dir.glob(f"{name}-*.aot"),
        key=lambda p: p.stat().st_mtime,
        reverse=True,
    )
    for old in entries[keep:]:
        try:
            old.unlink()
        except OSError:
            pass
