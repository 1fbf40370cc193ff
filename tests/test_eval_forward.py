"""EvalForward: bucketed padding must match exact-length inference closely
(the padding deviation the SURVEY flags as a hard part), and
ChunkedInference must produce correctly scaled lengths."""

import numpy as np

import jax
import jax.numpy as jnp

from aero_tpu.eval.forward import ChunkedInference, EvalForward
from aero_tpu.eval.metrics import get_lsd
from aero_tpu.models.aero import Aero
from aero_tpu.train.train_step import TrainState

KW = dict(channels=8, growth=2, nfft=512, hop_length=64, strides=(4, 4),
          enc_freq_attn=0, norm_starts=1, norm_groups=2, dconv_mode=1,
          dconv_depth=1, dconv_comp=1, dconv_time_attn=1, dconv_lstm=1,
          dconv_init=1e-3, rescale=0.1, lr_sr=4000, hr_sr=16000,
          spec_upsample=True, act_func="gelu")


def _state(gen, x):
    variables = dict(gen.init(jax.random.PRNGKey(0), x, train=False))
    params = variables.pop("params")
    return TrainState(step=jnp.zeros((), jnp.int32), gen_params=params,
                      gen_state=variables, gen_opt_state=(),
                      disc_params={}, disc_state={}, disc_opt_state=(),
                      rng=jax.random.PRNGKey(0))


def test_bucketed_matches_exact():
    gen = Aero(**KW)
    rng = np.random.default_rng(0)
    t = 4321  # awkward length
    x = (0.1 * rng.standard_normal((1, 1, t))).astype(np.float32)
    state = _state(gen, jnp.asarray(x[..., :4000]))

    exact = EvalForward(gen, state, scale=4.0, lr_sr=4000, bucket_s=0)
    bucketed = EvalForward(gen, state, scale=4.0, lr_sr=4000, bucket_s=0.5)

    y_exact = exact(x)
    y_bucket = bucketed(x)
    assert y_exact.shape == y_bucket.shape == (1, 1, t * 4)

    # outputs must be near-identical signals (reflect-tail padding keeps
    # global statistics realistic); quantify with LSD and correlation
    lsd = get_lsd(y_exact[:, 0], y_bucket[:, 0])
    assert lsd < 0.35, lsd
    corr = np.corrcoef(y_exact.ravel(), y_bucket.ravel())[0, 1]
    assert corr > 0.98, corr


def test_chunked_inference_lengths():
    gen = Aero(**KW)
    rng = np.random.default_rng(1)
    x = (0.1 * rng.standard_normal((1, 1, 9000))).astype(np.float32)
    state = _state(gen, jnp.asarray(x[..., :4000]))
    fwd = EvalForward(gen, state, scale=4.0, lr_sr=4000, bucket_s=0.5)
    chunked = ChunkedInference(fwd, sr=4000, segment_s=1.0)  # 3 chunks
    y = chunked(x)
    assert y.shape == (1, 1, 36000)
    assert np.isfinite(y).all()


def test_chunked_batched_matches_sequential():
    """batch_chunks folds full chunks into the batch axis; results must
    equal sequential chunking exactly (per-chunk normalization is
    batch-independent)."""
    gen = Aero(**KW)
    rng = np.random.default_rng(2)
    x = (0.1 * rng.standard_normal((1, 1, 10500))).astype(np.float32)
    state = _state(gen, jnp.asarray(x[..., :4000]))
    fwd = EvalForward(gen, state, scale=4.0, lr_sr=4000, bucket_s=0.5)

    seq = ChunkedInference(fwd, sr=4000, segment_s=1.0)(x)
    bat = ChunkedInference(fwd, sr=4000, segment_s=1.0, batch_chunks=True)(x)
    assert seq.shape == bat.shape == (1, 1, 42000)
    np.testing.assert_allclose(bat, seq, atol=2e-4)


def test_chunked_pad_tail_single_shape():
    """pad_tail serving mode: the ragged tail is reflect-padded to a
    whole chunk so only ONE forward shape runs; output length is exact
    and the valid region stays close to the exact-tail run (the model
    is not length-invariant, so equality is approximate by design)."""
    gen = Aero(**KW)
    rng = np.random.default_rng(3)
    x = (0.1 * rng.standard_normal((1, 1, 10500))).astype(np.float32)
    state = _state(gen, jnp.asarray(x[..., :4000]))
    fwd = EvalForward(gen, state, scale=4.0, lr_sr=4000, bucket_s=0.5)

    shapes = []

    def spy(z):
        shapes.append(z.shape[-1])
        return fwd(z)

    exact = ChunkedInference(fwd, sr=4000, segment_s=1.0,
                             batch_chunks=True)(x)
    padded = ChunkedInference(spy, sr=4000, segment_s=1.0,
                              batch_chunks=True, pad_tail=True)(x)
    assert set(shapes) == {4000}  # one executable shape, tail included
    assert padded.shape == exact.shape == (1, 1, 42000)
    # full chunks identical; tail region correlated but not bit-equal
    np.testing.assert_allclose(padded[..., :40000], exact[..., :40000],
                               atol=2e-4)
    a, b = padded[0, 0, 40000:], exact[0, 0, 40000:]
    corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)
                                 + 1e-12))
    assert corr > 0.95, corr
    # short input (< one chunk) wrap-pads rather than reflect
    y_short = ChunkedInference(spy, sr=4000, segment_s=1.0,
                               batch_chunks=True, pad_tail=True)(
        x[..., :1500])
    assert y_short.shape == (1, 1, 6000)
    # explicit scale produces the same exact length on the integer case
    y_scaled = ChunkedInference(spy, sr=4000, segment_s=1.0,
                                batch_chunks=True, pad_tail=True,
                                scale=4.0)(x)
    assert y_scaled.shape == exact.shape


def test_chunked_pad_tail_non_integer_scale_trim():
    """ADVICE r4: the trim must honor the exact-tail path's int(t*scale)
    contract for non-integer scales — the shape-ratio inference can land
    one sample off (round vs int on a fractional t*scale)."""

    def fake_fwd(z):  # a 1.5x "model": exactly scale * input length
        return np.zeros(z.shape[:-1] + (int(z.shape[-1] * 1.5),), np.float32)

    # t=1301, chunk=1000 -> t*scale = 1951.5; int() contract = 1951,
    # the ratio-round fallback would give 1952
    x = np.zeros((1, 1, 1301), np.float32)
    y = ChunkedInference(fake_fwd, sr=1000, segment_s=1.0,
                         pad_tail=True, scale=1.5)(x)
    assert y.shape[-1] == int(1301 * 1.5) == 1951, y.shape


def test_mesh_sharded_chunked_matches_single_device():
    """Multi-chip serving (predict.py): chunk batch sharded over an
    8-device dp mesh + replicated params must produce the same waveform
    as plain single-device chunked inference (EvalForward(mesh=...),
    ChunkedInference(mesh=...))."""
    from aero_tpu.parallel import mesh as pmesh

    gen = Aero(**KW)
    rng = np.random.default_rng(2)
    # 8.6 s at 4 kHz -> 8 full 1 s chunks (divides the mesh) + tail
    x = (0.1 * rng.standard_normal((1, 1, 34400))).astype(np.float32)
    state = _state(gen, jnp.asarray(x[..., :4000]))

    plain = ChunkedInference(
        EvalForward(gen, state, scale=4.0, lr_sr=4000, bucket_s=0.5),
        sr=4000, segment_s=1.0, batch_chunks=True)

    mesh = pmesh.make_mesh()
    assert len(mesh.devices.reshape(-1)) == 8  # conftest virtual devices
    sharded = ChunkedInference(
        EvalForward(gen, state, scale=4.0, lr_sr=4000, bucket_s=0.5,
                    mesh=mesh),
        sr=4000, segment_s=1.0, batch_chunks=True, mesh=mesh)

    y0 = plain(x)
    y1 = sharded(x)
    assert y0.shape == y1.shape == (1, 1, 34400 * 4)
    np.testing.assert_allclose(y1, y0, rtol=1e-5, atol=2e-5)


def test_mesh_sharded_chunked_short_file_pads_to_device_count():
    """A file with FEWER full chunks than devices must still shard:
    the chunk batch wraps around to a device-count multiple (a plain
    stack[:pad] under-pads when pad > n_chunks, which silently fell
    back to single-device execution)."""
    from aero_tpu.parallel import mesh as pmesh

    gen = Aero(**KW)
    rng = np.random.default_rng(3)
    # 3.4 s at 4 kHz -> 3 full 1 s chunks (< 8 devices) + tail
    x = (0.1 * rng.standard_normal((1, 1, 13600))).astype(np.float32)
    state = _state(gen, jnp.asarray(x[..., :4000]))

    plain = ChunkedInference(
        EvalForward(gen, state, scale=4.0, lr_sr=4000, bucket_s=0.5),
        sr=4000, segment_s=1.0, batch_chunks=True)

    mesh = pmesh.make_mesh()
    n_dev = len(mesh.devices.reshape(-1))
    ef = EvalForward(gen, state, scale=4.0, lr_sr=4000, bucket_s=0.5,
                     mesh=mesh)
    batch_sizes = []

    def recording_forward(inp):
        batch_sizes.append(inp.shape[0])
        return ef(inp)

    sharded = ChunkedInference(recording_forward, sr=4000, segment_s=1.0,
                               batch_chunks=True, mesh=mesh)
    y1 = sharded(x)
    y0 = plain(x)
    # the full-chunk batch was padded up to the device count (sharded),
    # not left at 3 (single-device fallback)
    assert n_dev in batch_sizes, batch_sizes
    assert y0.shape == y1.shape == (1, 1, 13600 * 4)
    np.testing.assert_allclose(y1, y0, rtol=1e-5, atol=2e-5)
