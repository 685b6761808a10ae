import jax, jax.numpy as jnp, numpy as np, time
def check(name, fn, *args):
    st = time.perf_counter()
    try:
        out = jax.jit(fn)(*args)
        jax.effects_barrier()
        v = np.asarray(out)
        print(f"{name}: OK {float(np.ravel(v)[0]):.3f} ({time.perf_counter()-st:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name}: ERR {str(e)[:40]} ({time.perf_counter()-st:.0f}s)", flush=True)

from ddsp_svc_tpu.models.ddsp import CombSubSuperFast
from ddsp_svc_tpu.ops.source import fast_source_gen
from ddsp_svc_tpu.ops.spectral import stft, istft
from ddsp_svc_tpu.ops.window import hann_window
sr, block, win, n_unit = 44100, 512, 2048, 768
model = CombSubSuperFast(sampling_rate=sr, block_size=block, win_length=win, n_unit=n_unit, n_spk=1)
batch, t = 2, 86
key = jax.random.PRNGKey(0)
ku, kf, ki, kn = jax.random.split(key, 4)
units = jax.random.normal(ku, (batch, t, n_unit), jnp.float32)
f0 = 220.0*jnp.ones((batch,t,1), jnp.float32)
volume = 0.5*jnp.ones((batch,t,1), jnp.float32)
spk = jnp.zeros((batch,1), jnp.int32)
params = model.init({"params": ki, "noise": kn}, units, f0, volume, spk_id=spk)["params"]
w = jnp.asarray(hann_window(win))

def ctr(p):
    comb, phase = fast_source_gen(f0, sr, block)
    src_f, nf, _ = model.apply({"params": p}, units, f0, phase, volume, spk_id=spk, method=CombSubSuperFast.controls)
    return src_f, nf, comb

check("a-controls", lambda p: ctr(p)[0].real.sum(), params)
def b_fn(p):
    src_f, nf, comb = ctr(p)
    S = stft(comb, win, block, window=w)
    return jnp.abs(S).sum()
check("b-controls+stft", b_fn, params)
def c_fn(p, k):
    src_f, nf, comb = ctr(p)
    src_f = jnp.concatenate([src_f, src_f[:, -1:, :]], axis=1)
    S = stft(comb, win, block, window=w) * src_f.transpose(0,2,1)
    noise = jax.random.normal(k, comb.shape, comb.dtype)
    Sn = stft(noise, win, block, window=w)
    return jnp.abs(S).sum() + jnp.abs(Sn).sum()
check("c-+noise-stft-mul", c_fn, params, jax.random.PRNGKey(1))
def d_fn(p, k):
    src_f, nf, comb = ctr(p)
    src_f = jnp.concatenate([src_f, src_f[:, -1:, :]], axis=1)
    nf = jnp.concatenate([nf, nf[:, -1:, :]], axis=1)
    noise = jax.random.normal(k, comb.shape, comb.dtype)
    S = stft(comb, win, block, window=w) * src_f.transpose(0,2,1) + stft(noise, win, block, window=w) * nf.transpose(0,2,1)
    sig = istft(S, win, block, window=w)
    return jnp.sum(jnp.abs(sig))
check("d-full", d_fn, params, jax.random.PRNGKey(1))
