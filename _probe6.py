import jax, jax.numpy as jnp, numpy as np, time
from ddsp_svc_tpu.models.ddsp import CombSubSuperFast
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
fn = jax.jit(lambda p,u,f,v,k: jnp.sum(jnp.abs(model.apply({"params":p},u,f,v,spk_id=spk,infer=True,rngs={"noise":k})[0])))
st = time.perf_counter()
try:
    lowered = fn.lower(params, units, f0, volume, jax.random.PRNGKey(1))
    print(f"lowered ok ({time.perf_counter()-st:.0f}s)", flush=True)
    st = time.perf_counter()
    compiled = lowered.compile()
    print(f"compiled ok ({time.perf_counter()-st:.0f}s)", flush=True)
    st = time.perf_counter()
    out = compiled(params, units, f0, volume, jax.random.PRNGKey(1))
    jax.effects_barrier()
    print("executed ok:", float(np.asarray(out)), f"({time.perf_counter()-st:.0f}s)", flush=True)
except Exception as e:
    print(f"FAILED at stage: {type(e).__name__} {str(e)[:80]} ({time.perf_counter()-st:.0f}s)", flush=True)
