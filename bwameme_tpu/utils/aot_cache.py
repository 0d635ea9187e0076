"""AOT executable cache: skip TRACING, not just XLA compilation.

JAX's persistent compilation cache only removes the backend-compile cost;
the engine's fused seeding programs additionally cost minutes of Python
tracing/lowering per process on 1-vCPU hosts (measured 2026-08-20: 365 s
warmup of which <15 s was compilation, the rest tracing the unrolled
probe rounds). This module persists the COMPILED executable
(jax.experimental.serialize_executable) keyed by

    (program name, arg shapes/dtypes, static kwargs, backend platform +
     device kind, jax version, a salt hashed from the source files that
     define the program)

so a warm start pays one disk read + executable load instead of
trace + lower + compile. The salt auto-invalidates on any edit to the
listed source files. Any failure (API drift, backend mismatch, stale
blob) falls back to the plain jit path — the cache is an accelerator,
never a correctness dependency.

The reference ships pre-built binaries per ISA/mode for the same reason
(src/runsimd.cpp dispatches among bwa-meme_modeN.* executables); here the
"binary matrix" is materialized lazily per (program, shapes, chip).
"""

from __future__ import annotations

import hashlib
import os
import pickle

import jax

_SALT_CACHE: dict[tuple[str, ...], str] = {}


def _source_salt(files: tuple[str, ...]) -> str:
    salt = _SALT_CACHE.get(files)
    if salt is None:
        h = hashlib.sha256()
        for p in files:
            try:
                with open(p, "rb") as f:
                    h.update(f.read())
            except OSError:
                h.update(b"?")
        _SALT_CACHE[files] = salt = h.hexdigest()[:16]
    return salt


def default_dir() -> str | None:
    d = os.environ.get("BWAMEME_AOT_CACHE_DIR")
    if d:
        return d
    base = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if base:
        return os.path.join(base, "aot")
    return None


_DEFAULT_SALT_FILES = tuple(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 *parts)
    for parts in (("ops", "sa_search.py"), ("seeding", "engine.py"),
                  ("index", "packing.py"))
)


def aot_jit(fn, name: str, static_argnames=(), salt_files=None,
            cache_dir: str | None = None, key_extra=None):
    """jit(fn) with an on-disk executable cache.

    Returns a callable with jit semantics for ARRAY arguments; static
    kwargs must be hashable. The executable is keyed on concrete arg
    shapes/dtypes, so like jit, a new shape set triggers a new entry.

    key_extra: any repr-able value capturing TRACE-TIME parameters that are
    baked into the program but invisible in arg shapes/dtypes — e.g. the
    P-RMI error-window bound that sets the binary-search unroll depth
    (engine max_width -> sa_search lb_rounds) and trace-time env knobs.
    An index rebuilt with identical shapes but different window widths
    MUST NOT reuse a stale executable (it would probe too few rounds and
    silently return wrong SMEMs), so callers pass those values here."""
    jf = jax.jit(fn, static_argnames=static_argnames)
    salt_files = tuple(salt_files or _DEFAULT_SALT_FILES)
    mem: dict[str, object] = {}

    def _key(args, kwargs) -> str:
        dev = jax.devices()[0]
        spec = jax.tree.map(
            lambda x: (getattr(x, "shape", None),
                       str(getattr(x, "dtype", type(x).__name__))),
            args)
        raw = repr((name, spec, tuple(sorted(kwargs.items())),
                    dev.platform, getattr(dev, "device_kind", "?"),
                    jax.__version__, _source_salt(salt_files), key_extra))
        return hashlib.sha256(raw.encode()).hexdigest()[:24]

    def call(*args, **kwargs):
        cdir = cache_dir or default_dir()
        # the serialized executable bakes in the device assignment; on
        # multi-device backends (the virtual 8-CPU test mesh) the reloaded
        # exe demands N-sharded args — cache only the 1-device case (the
        # production TPU-chip path, where tracing cost actually hurts)
        if cdir is None or len(jax.devices()) != 1:
            return jf(*args, **kwargs)
        try:
            k = _key(args, kwargs)
        except Exception:
            return jf(*args, **kwargs)
        exe = mem.get(k)
        if exe is not None:
            return exe(*args)
        path = os.path.join(cdir, f"{name}-{k}.jexe")
        if os.path.exists(path):
            try:
                from jax.experimental import serialize_executable as se

                with open(path, "rb") as f:
                    blob, in_tree, out_tree = pickle.load(f)
                exe = se.deserialize_and_load(blob, in_tree, out_tree)
                mem[k] = exe
                return exe(*args)
            except Exception:
                try:
                    os.unlink(path)  # stale/incompatible blob
                except OSError:
                    pass
        # cold: trace + lower + compile once, then persist
        try:
            from jax.experimental import serialize_executable as se

            compiled = jf.lower(*args, **kwargs).compile()
            blob, in_tree, out_tree = se.serialize(compiled)
            os.makedirs(cdir, exist_ok=True)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump((blob, in_tree, out_tree), f)
            os.replace(tmp, path)
            exe = se.deserialize_and_load(blob, in_tree, out_tree)
            mem[k] = exe
            return exe(*args)
        except Exception:
            return jf(*args, **kwargs)

    call.__name__ = name
    return call
