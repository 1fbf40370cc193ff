"""AOT-serialized serving executables (eval/aot.py, VERDICT r4 #2):
round-trip the compiled executable through disk, verify outputs match
the traced path bit-exactly, and verify the safety keys (code-signature
invalidation, graceful fallback on junk)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aero_tpu.eval import aot
from aero_tpu.eval.forward import EvalForward
from aero_tpu.models.aero import Aero
from aero_tpu.train.train_step import TrainState

KW = dict(in_channels=1, out_channels=1, channels=4, growth=2, nfft=512,
          hop_length=64, strides=[4, 2, 2, 2], enc_freq_attn=0,
          norm_starts=2, norm_groups=2, dconv_mode=1, dconv_depth=1,
          dconv_comp=4, dconv_time_attn=2, dconv_lstm=2, dconv_init=1e-3,
          lr_sr=4000, hr_sr=16000, spec_upsample=True, act_func="snake")


def _state(gen, x):
    v = gen.init(jax.random.PRNGKey(0), x, train=False)
    v = jax.tree_util.tree_map(lambda a: a, dict(v))
    return TrainState(step=jnp.zeros((), jnp.int32),
                      gen_params=v.pop("params"), gen_state=v,
                      gen_opt_state=(), disc_params={}, disc_state={},
                      disc_opt_state=(), rng=jax.random.PRNGKey(1))


def test_get_or_compile_roundtrip(tmp_path):
    def f(s, x):
        return {"y": s["w"] @ x + s["b"]}

    s = {"w": jnp.ones((16, 16)), "b": jnp.zeros((16, 1))}
    x = jnp.arange(16.0 * 4).reshape(16, 4)

    c1 = aot.get_or_compile(f, (s, x), str(tmp_path), "t")
    files = [p for p in os.listdir(tmp_path) if p.endswith(".aotx")]
    assert len(files) == 1
    # a fresh get must LOAD (deserialize), not recompile: loading the
    # same path directly returns a working executable
    path = aot.cache_path(str(tmp_path), "t", (s, x))
    assert os.path.basename(path) == files[0]
    c2 = aot.load_compiled(path)
    assert c2 is not None
    np.testing.assert_array_equal(np.asarray(c1(s, x)["y"]),
                                  np.asarray(c2(s, x)["y"]))


def test_load_compiled_graceful_on_junk(tmp_path):
    p = str(tmp_path / "junk.aotx")
    with open(p, "wb") as f:
        f.write(b"not a pickle of an executable")
    assert aot.load_compiled(p) is None
    assert aot.load_compiled(str(tmp_path / "missing.aotx")) is None


def test_cache_key_separates_shapes_tags_and_code(tmp_path, monkeypatch):
    s = {"w": jnp.ones((8, 8))}
    x1 = jnp.ones((8, 2))
    x2 = jnp.ones((8, 3))
    d = str(tmp_path)
    assert aot.cache_path(d, "a", (s, x1)) != aot.cache_path(d, "a", (s, x2))
    assert aot.cache_path(d, "a", (s, x1)) != aot.cache_path(d, "b", (s, x1))
    # code-signature invalidation: a changed source tree changes the key
    p0 = aot.cache_path(d, "a", (s, x1))
    monkeypatch.setattr(aot, "_CODE_SIG", "deadbeefdeadbeef")
    assert aot.cache_path(d, "a", (s, x1)) != p0


def test_eval_forward_aot_matches_traced(tmp_path):
    """EvalForward(aot_dir=...) must produce the exact traced-path output,
    write the executable, and a FRESH EvalForward (new process stand-in)
    must load it from disk instead of recompiling."""
    gen = Aero(**KW)
    rng = np.random.default_rng(5)
    x = (0.1 * rng.standard_normal((1, 1, 4000))).astype(np.float32)
    state = _state(gen, jnp.asarray(x))

    plain = EvalForward(gen, state, scale=4.0, lr_sr=4000, bucket_s=0.5)
    y0 = plain(x)

    d = str(tmp_path / "aot")
    f1 = EvalForward(gen, state, scale=4.0, lr_sr=4000, bucket_s=0.5,
                     aot_dir=d, aot_tag="test")
    y1 = f1(x)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    files = [p for p in os.listdir(d) if p.endswith(".aotx")]
    assert len(files) == 1

    # fresh instance (new-process stand-in): loads the executable from
    # disk, VERIFIES it with one throwaway execution, and either serves
    # it or falls back to a clean recompile. XLA:CPU's AOT loader cannot
    # materialize some full-model outputs ("Buffer Definition Event not
    # found") — the verification turns that into a recompile, so the
    # output must be correct on EVERY backend; the strict no-recompile
    # assertion lives in test_get_or_compile_roundtrip (where the CPU
    # loader works). On TPU the full model takes the fast path (PERF.md
    # 'Cold-start predict').
    recompiles = []
    orig_save = aot.save_compiled
    aot.save_compiled = lambda *a, **k: (recompiles.append(a),
                                         orig_save(*a, **k))[1]
    try:
        f2 = EvalForward(gen, state, scale=4.0, lr_sr=4000, bucket_s=0.5,
                         aot_dir=d, aot_tag="test")
        y2 = f2(x)
    finally:
        aot.save_compiled = orig_save
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y2))
    # whichever path ran, the cache holds exactly one (loadable or
    # freshly rewritten) entry for this signature
    assert len([p for p in os.listdir(d) if p.endswith(".aotx")]) == 1


def test_eval_forward_aot_ragged_second_shape(tmp_path):
    """Two bucket shapes produce two cache entries; both load back."""
    gen = Aero(**KW)
    rng = np.random.default_rng(6)
    state = _state(gen, jnp.asarray(
        (0.1 * rng.standard_normal((1, 1, 2000))).astype(np.float32)))
    d = str(tmp_path / "aot")
    fwd = EvalForward(gen, state, scale=4.0, lr_sr=4000, bucket_s=0.5,
                      aot_dir=d, aot_tag="test")
    x1 = (0.1 * rng.standard_normal((1, 1, 2000))).astype(np.float32)
    x2 = (0.1 * rng.standard_normal((1, 1, 3100))).astype(np.float32)
    y1, y2 = fwd(x1), fwd(x2)
    assert y1.shape == (1, 1, 8000) and y2.shape == (1, 1, 12400)
    assert len([p for p in os.listdir(d) if p.endswith(".aotx")]) == 2
