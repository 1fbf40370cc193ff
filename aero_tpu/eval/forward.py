"""Variable-length inference under XLA's static-shape model.

The reference evaluates full-length files at batch 1
(``/root/reference/train.py:62-74``) — trivially dynamic in eager torch,
a recompilation storm under jit. Strategy here (SURVEY.md §7 hard parts):
pad the input up to a length bucket (multiple of ``bucket_s`` seconds),
run a per-bucket cached jitted forward, and trim the output to the true
scaled length. ``bucket_s=0`` compiles per exact length instead.

Padding uses edge-reflection rather than zeros so the model's global
mean/std normalization and time attention see realistic statistics in
the padded tail.
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np


def bucket_target(n: int, bucket: int) -> int:
    """Padded length for a length-``n`` signal under ``bucket``-sample
    bucketing (one jit compile per bucket). THE one definition of the
    bucket arithmetic — EvalForward and both solver valid paths must
    agree on it or fused/split valid losses silently diverge."""
    return max(bucket, int(math.ceil(n / bucket)) * bucket)


def _pad_reflect_tail(x: np.ndarray, target: int) -> np.ndarray:
    t = x.shape[-1]
    if t >= target:
        return x[..., :target]
    pad = target - t
    out = x
    while pad > 0:
        chunk = min(pad, out.shape[-1] - 1) if out.shape[-1] > 1 else pad
        tail = out[..., -chunk - 1:-1][..., ::-1] if out.shape[-1] > 1 else \
            np.zeros(out.shape[:-1] + (chunk,), out.dtype)
        out = np.concatenate([out, tail], axis=-1)
        pad -= chunk
    return out


class EvalForward:
    """Jitted full-file generator forward with length bucketing.

    ``scale`` is output-length / input-length (e.g. 4 for 4->16 kHz
    spectral upsampling, 1 when the dataset pre-upsamples).

    ``mesh``: optional local device mesh for multi-chip serving — when
    the batch divides the device count, params are replicated and the
    batch axis is sharded over ``dp``, so XLA partitions the forward
    across chips (one long file's 10 s chunks run data-parallel; see
    ChunkedInference). Batches that don't divide (e.g. the ragged tail
    chunk at B=1) fall back to single-device execution.
    """

    def __init__(self, gen, state, scale: float, lr_sr: int,
                 bucket_s: float = 1.0, return_spec: bool = False,
                 mesh=None, aot_dir: tp.Optional[str] = None,
                 aot_tag: str = ""):
        self.gen = gen
        self.scale = scale
        self.bucket = int(bucket_s * lr_sr)
        self.return_spec = return_spec
        self.mesh = mesh
        # aot_dir: serialized-executable cache (eval/aot.py) — a warm
        # process start deserializes the PJRT executable instead of
        # re-tracing + compile-cache lookup. Single-device calls only
        # (the mesh path's shardings are not serialized).
        self.aot_dir = aot_dir
        self.aot_tag = aot_tag
        self._cache: tp.Dict[int, tp.Any] = {}
        self.update_state(state)  # pins on device (see update_state)

    def update_state(self, state):
        # Pin the state on device ONCE. test.py/predict.py hand a
        # host-numpy tree (checkpoint load): without this, EVERY jitted
        # call re-uploads the full parameter set (~80 MB for the
        # canonical model — measured 1.8 s/call through the remote
        # tunnel, swamping the ~30 ms forward). For trees already on
        # device (solver paths) this is a no-op.
        self.state = jax.device_put(state)
        self._mesh_state = None
        # params change but shapes don't: cached jits stay valid since
        # state is an argument.

    def _call_args(self, x: np.ndarray):
        """(state, device input) — mesh-sharded when possible."""
        if self.mesh is not None:
            n_dev = len(self.mesh.devices.reshape(-1))
            if x.shape[0] >= n_dev and x.shape[0] % n_dev == 0:
                from aero_tpu.parallel import mesh as pmesh

                if self._mesh_state is None:
                    self._mesh_state = pmesh.replicate(self.state, self.mesh)
                return self._mesh_state, pmesh.shard_batch(x, self.mesh)
        return self.state, jnp.asarray(x)

    def _fn_for(self, t: int, call_args: tp.Optional[tuple] = None):
        if t not in self._cache:
            gen = self.gen
            return_spec = self.return_spec

            @jax.jit
            def fwd(state, lr):
                variables = {"params": state.gen_params, **state.gen_state}
                if return_spec:
                    pr, pr_spec, lr_spec = gen.apply(
                        variables, lr, train=False,
                        return_spec=True, return_lr_spec=True)
                    # split complex -> (real, imag): some remote runtimes
                    # cannot transfer complex buffers to host
                    return (pr,
                            (jnp.real(pr_spec), jnp.imag(pr_spec)),
                            (jnp.real(lr_spec), jnp.imag(lr_spec)))
                return gen.apply(variables, lr, train=False)

            if call_args is not None and self.aot_dir and \
                    call_args[0] is self.state:
                # single-device serving: load (or build + serialize) the
                # compiled executable — skips trace AND compile on warm
                # process starts (PERF.md 'Cold-start predict', r5)
                from aero_tpu.eval import aot

                self._cache[t] = aot.get_or_compile(
                    fwd, call_args, self.aot_dir,
                    f"EvalForward|{self.aot_tag}|spec={return_spec}")
            else:
                self._cache[t] = fwd
        return self._cache[t]

    def __call__(self, lr: np.ndarray):
        """lr: [B, 1, T] numpy -> pr [B, 1, T*scale] (+ specs if configured)."""
        t = lr.shape[-1]
        padded_t = t if self.bucket <= 0 else bucket_target(t, self.bucket)
        x = _pad_reflect_tail(np.asarray(lr, np.float32), padded_t)
        args = self._call_args(x)
        out = self._fn_for(padded_t, args)(*args)
        target = int(t * self.scale)
        if self.return_spec:
            pr, (pr_re, pr_im), (lr_re, lr_im) = out
            pr_spec = np.asarray(pr_re) + 1j * np.asarray(pr_im)
            lr_spec = np.asarray(lr_re) + 1j * np.asarray(lr_im)
            return np.asarray(pr)[..., :target], pr_spec, lr_spec
        return np.asarray(out)[..., :target]


class ChunkedInference:
    """predict.py-style fixed-duration chunking (reference predict.py:22,61-85):
    split into ``segment_s`` chunks, forward each, concatenate.

    ``batch_chunks=True`` runs all full-size chunks as ONE batch — on a
    single chip that amortizes dispatch, and with ``mesh`` given the
    batch is sharded over the data-parallel axis (multi-chip serving of
    one long file). The ragged tail chunk runs separately.

    ``pad_tail=True`` (serving mode, predict.py ``+pad_tail_to_chunk=1``)
    reflect-pads the ragged tail up to a whole chunk instead, so the
    whole serving path compiles exactly ONE executable shape — one
    compile-cache entry, one warmup, one dispatch per file. The output
    is trimmed back to the exact scaled length. Off by default: the
    model is not length-invariant (STFT framing, BLSTM, attention see
    the pad), so tail samples differ slightly from the reference's
    exact-tail forward (reference predict.py:61-69).
    """

    def __init__(self, forward: tp.Callable, sr: int, segment_s: float = 10.0,
                 batch_chunks: bool = False, mesh=None,
                 pad_tail: bool = False, scale: float | None = None):
        self.forward = forward
        self.chunk = int(sr * segment_s)
        self.batch_chunks = batch_chunks
        self.mesh = mesh
        self.pad_tail = pad_tail
        self.scale = scale

    def __call__(self, lr: np.ndarray) -> np.ndarray:
        t = lr.shape[-1]
        if self.pad_tail and t % self.chunk:
            pad = self.chunk - t % self.chunk
            mode = "reflect" if pad < t else "wrap"
            xp = np.pad(lr, [(0, 0)] * (lr.ndim - 1) + [(0, pad)], mode=mode)
            y = self(np.ascontiguousarray(xp))
            # trim to the exact-tail path's int(t*scale) length contract;
            # the known model scale is authoritative — inferring it from
            # the padded run's shape ratio can land one sample off for
            # non-integer-scale experiments (ADVICE r4)
            if self.scale is not None:
                out_len = int(t * self.scale)
            else:
                out_len = round(t * (y.shape[-1] / xp.shape[-1]))
            return y[..., :out_len]
        n_chunks = max(1, math.ceil(t / self.chunk))
        if not self.batch_chunks or n_chunks == 1:
            outs = []
            for i in range(n_chunks):
                sl = lr[..., i * self.chunk:min((i + 1) * self.chunk, t)]
                outs.append(np.asarray(self.forward(sl)))
            return np.concatenate(outs, axis=-1)

        n_full = t // self.chunk
        outs = []
        if n_full:
            # [B, C, n_full, chunk] -> fold chunks into the batch axis
            stack = lr[..., :n_full * self.chunk].reshape(
                *lr.shape[:-1], n_full, self.chunk)
            stack = np.moveaxis(stack, -2, 0).reshape(
                n_full * lr.shape[0], *lr.shape[1:-1], self.chunk)
            if self.mesh is not None:
                n_dev = len(self.mesh.devices.reshape(-1))
                pad = (-len(stack)) % n_dev
                if pad:
                    # wrap indices: pad may exceed len(stack) (fewer
                    # chunks than devices) — stack[:pad] alone would
                    # under-pad and silently disable the mesh sharding
                    idx = np.arange(pad) % len(stack)
                    stack = np.concatenate([stack, stack[idx]], axis=0)
            y = np.asarray(self.forward(stack))
            y = y[:n_full * lr.shape[0]]
            y = y.reshape(n_full, lr.shape[0], *y.shape[1:])
            y = np.moveaxis(y, 0, -2).reshape(
                *lr.shape[:-1], n_full * y.shape[-1])
            outs.append(y)
        if n_full * self.chunk < t:
            outs.append(np.asarray(self.forward(lr[..., n_full * self.chunk:])))
        return np.concatenate(outs, axis=-1)


def make_spec_fns(args, gen):
    """Host-side spectrogram helpers for artifact saving (complex-safe).

    AERO: hr spectra via the model's scaled analysis STFT
    (reference evaluate.py:67); other models: plain spectro at nfft//4
    window (reference evaluate.py:69-73).
    """
    import jax

    exp = args.experiment
    if exp.model == "aero":

        @jax.jit
        def hr_spec(hr):
            z = gen._spec(hr, scale=True)
            return jnp.real(z), jnp.imag(z)

        def hr_spec_np(hr):
            re, im = hr_spec(jnp.asarray(np.asarray(hr)))
            return np.asarray(re) + 1j * np.asarray(im)

        return {"hr_spec": hr_spec_np}

    from aero_tpu.ops.spec import spectro

    nfft = int(exp.nfft)

    @jax.jit
    def spec(x):
        z = spectro(x, nfft, win_length=nfft // 4)
        return jnp.real(z), jnp.imag(z)

    def spec_np(x):
        re, im = spec(jnp.asarray(np.asarray(x)))
        return np.asarray(re) + 1j * np.asarray(im)

    return {"spec": spec_np}
