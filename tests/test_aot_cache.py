"""utils/aot_cache.py: fallback and keying behavior (CPU).

The executable-serialization round trip itself is exercised on the real
chip (bench warm starts); here we pin the safety properties: multi-device
backends bypass the cache (the serialized exe bakes in the device
assignment), results are correct either way, and the key separates
static kwargs and source-salt changes.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from bwameme_tpu.utils import aot_cache


def test_multi_device_backend_bypasses_cache(tmp_path):
    calls = []

    def f(x, k):
        calls.append(1)
        return x * k

    g = aot_cache.aot_jit(f, name="t1", static_argnames=("k",),
                          cache_dir=str(tmp_path))
    x = jnp.arange(8.0)
    out = g(x, k=3)
    np.testing.assert_allclose(np.asarray(out), np.arange(8.0) * 3)
    # the 8-device CPU test backend must bypass (no .jexe files)
    assert len(jax.devices()) != 1
    assert not list(tmp_path.iterdir())


def test_key_separates_statics_and_salt(tmp_path):
    salt = tmp_path / "salt.py"
    salt.write_text("v1")
    g = aot_cache.aot_jit(lambda x, k: x + k, name="t2",
                          static_argnames=("k",),
                          salt_files=(str(salt),),
                          cache_dir=str(tmp_path))
    args = (jnp.ones(4),)
    k1 = g.__wrapped_key__ if hasattr(g, "__wrapped_key__") else None
    # access the internal key fn through the closure for determinism
    # (public contract: different statics / salt -> different entries)
    import hashlib

    def key_of(kw, saltv):
        salt.write_text(saltv)
        aot_cache._SALT_CACHE.clear()
        spec = jax.tree.map(
            lambda a: (getattr(a, "shape", None),
                       str(getattr(a, "dtype", type(a).__name__))), args)
        dev = jax.devices()[0]
        raw = repr(("t2", spec, tuple(sorted(kw.items())), dev.platform,
                    getattr(dev, "device_kind", "?"), jax.__version__,
                    aot_cache._source_salt((str(salt),))))
        return hashlib.sha256(raw.encode()).hexdigest()[:24]

    assert key_of({"k": 1}, "v1") != key_of({"k": 2}, "v1")
    assert key_of({"k": 1}, "v1") != key_of({"k": 1}, "v2")


def test_default_dir_resolution(monkeypatch):
    monkeypatch.delenv("BWAMEME_AOT_CACHE_DIR", raising=False)
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/x/y")
    assert aot_cache.default_dir() == os.path.join("/x/y", "aot")
    monkeypatch.setenv("BWAMEME_AOT_CACHE_DIR", "/z")
    assert aot_cache.default_dir() == "/z"
