import jax, jax.numpy as jnp, numpy as np, time
def check(name, fn, *args):
    st = time.perf_counter()
    try:
        out = jax.jit(fn)(*args)
        jax.effects_barrier()
        v = np.asarray(out)
        print(f"{name}: OK {float(np.ravel(v)[0]):.3f} ({time.perf_counter()-st:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name}: ERR ({time.perf_counter()-st:.0f}s)", flush=True)

from ddsp_svc_tpu.models.unit2control import Unit2Control
from ddsp_svc_tpu.ops.source import fast_source_gen
batch, t = 2, 86
f0 = 220*jnp.ones((batch,t,1)); ph = jnp.zeros((batch,t,1)); vol = 0.5*jnp.ones((batch,t,1))

def mk(n_unit, big):
    splits = {"a": 1025, "b": 1025, "c": 1025, "d": 1025} if big else {"a": 65, "b": 65}
    u2c = Unit2Control(n_unit, 1, splits, use_naive_v2=True, use_conv_stack=True)
    uu = jax.random.normal(jax.random.PRNGKey(3), (batch, t, n_unit))
    pv = u2c.init(jax.random.PRNGKey(4), uu, f0, ph, vol)
    return u2c, uu, pv

for name, n_unit, big in [("a3-small-bigout", 16, True), ("a2-wide-smallout", 768, False), ("a1-wide-bigout", 768, True)]:
    u2c, uu, pv = mk(n_unit, big)
    check(name, lambda p, m=u2c, u=uu: m.apply(p, u, f0, ph, vol)[1].sum(), pv)

u2c, uu, pv = mk(16, False)
def with_src(p):
    comb, phase = fast_source_gen(f0, 44100, 512)
    return u2c.apply(p, uu, f0, phase, vol)[1].sum() + comb.sum()
check("a4-small+source", with_src, pv)
