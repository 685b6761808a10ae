"""Sequence-parallel cascade training (parallel/train_sp.py).

Two contracts:
  1. sp-invariance: the same step on a (dp, sp)=(4, 2) mesh and on a
     (4, 1) mesh yields the same loss/metrics and the same updated params
     (RNG is drawn per-frame / per-data-shard, halos are exact).
  2. dense agreement: the shard_map'd loss equals a dense replication of
     the same loss (same RNG assembly) computed with plain model.apply
     calls on the whole sequence — validates the halo machinery under AD
     against the real modules, mirroring diffusion/solver_new.py:142 loss
     semantics.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ddsp_svc_tpu.models.cascade import ReflowUnit2Wav, Unit2WavFast
from ddsp_svc_tpu.models.diffusion import linear_schedule
from ddsp_svc_tpu.models.naive_v2_diff import NaiveV2Diff
from ddsp_svc_tpu.ops.mel import LogMelSpectrogram
from ddsp_svc_tpu.parallel.train_sp import make_sp_cascade_train_step
from ddsp_svc_tpu.train.state import create_train_state

SR, HOP, WIN, N_UNIT, M = 16000, 64, 256, 16, 16
B, T = 4, 192  # 96 frames per time shard at sp=2 (>= DENOISER_HALO)


def _make(family):
    if family == "diffusion":
        model = Unit2WavFast(SR, HOP, WIN, N_UNIT, 2, out_dims=M,
                             n_layers=2, n_chans=32, k_step_max=100)
    else:
        model = ReflowUnit2Wav(SR, HOP, WIN, N_UNIT, 2, out_dims=M,
                               n_layers=2, n_chans=32)
    mel = LogMelSpectrogram(sr=SR, n_mels=M, n_fft=256, win_size=256,
                            hop_length=HOP, fmin=40.0, fmax=7000.0)
    rng = np.random.default_rng(7)
    batch = {
        "units": jnp.asarray(rng.standard_normal((B, T, N_UNIT)), jnp.float32),
        "f0": jnp.asarray(
            200.0 * np.exp(0.3 * np.sin(np.arange(T) / 9.0))[None, :, None]
            * np.ones((B, 1, 1)),
            jnp.float32,
        ),
        "volume": 0.5 * jnp.ones((B, T, 1), jnp.float32),
        "mel": jnp.asarray(
            -6.0 + 2.0 * rng.standard_normal((B, T, M)), jnp.float32
        ),
        "spk_id": jnp.ones((B, 1), jnp.int32),
    }
    kwargs = dict(infer=False, gt_spec=batch["mel"],
                  mel_extract_fn=mel.extract, key=jax.random.PRNGKey(3))
    if family == "reflow":
        kwargs["t_start"] = 0.0
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        batch["units"], batch["f0"], batch["volume"], spk_id=batch["spk_id"],
        **kwargs,
    )
    state = create_train_state(model, variables["params"], lr=1e-3)
    return model, mel, batch, state


@pytest.mark.parametrize("family", ["diffusion", "reflow"])
def test_sp_step_invariant_to_sp_factor(family):
    model, mel, batch, state = _make(family)
    # SGD so updated params compare raw psum'd grads (adam's sqrt(v)+eps
    # normalization amplifies reduction-order ulp noise where grad ~ 0)
    import optax
    from ddsp_svc_tpu.train.state import TrainState

    tx = optax.sgd(1e-3)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=state.params,
                       opt_state=tx.init(state.params),
                       apply_fn=model.apply, tx=tx)
    key = jax.random.PRNGKey(11)
    kw = dict(family=family, k_step_max=100 if family == "diffusion" else None)

    mesh_sp = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "time"))
    step_sp = make_sp_cascade_train_step(model, mel, mesh_sp, **kw)
    st_sp, m_sp = step_sp(state, batch, key)

    mesh_dp = Mesh(np.array(jax.devices()[:4]).reshape(4, 1), ("data", "time"))
    step_dp = make_sp_cascade_train_step(model, mel, mesh_dp, **kw)
    st_dp, m_dp = step_dp(state, batch, key)

    for k in m_sp:
        a, b = float(m_sp[k]), float(m_dp[k])
        assert abs(a - b) <= 1e-4 * max(1.0, abs(b)), (k, a, b)
    flat_sp = jax.tree_util.tree_leaves(st_sp.params)
    flat_dp = jax.tree_util.tree_leaves(st_dp.params)
    for a, b in zip(flat_sp, flat_dp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_sp_step_matches_dense_loss():
    family = "diffusion"
    model, mel, batch, state = _make(family)
    # SGD(lr=1) so (old - new) params ARE the psum'd gradients
    import optax
    from ddsp_svc_tpu.train.state import TrainState

    tx = optax.sgd(1.0)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=state.params,
                       opt_state=tx.init(state.params),
                       apply_fn=model.apply, tx=tx)
    key = jax.random.PRNGKey(11)
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "time"))
    step = make_sp_cascade_train_step(model, mel, mesh, family=family,
                                      k_step_max=100)
    new_state, metrics = step(state, batch, key)
    g_sp = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                        state.params, new_state.params)

    # ---- dense replication of the same loss with the same RNG assembly ----
    key_step, key_ddsp, key_noise = jax.random.split(key, 3)
    dkeys = jax.random.split(key_ddsp, T)
    nkeys = jax.random.split(key_noise, T)
    dp = 4
    b_l = B // dp

    # ddsp exciter noise: frame k, data shard r -> normal(fold(dkeys[k], r))
    noise_rows = []
    for r in range(dp):
        blocks = jax.vmap(
            lambda k: jax.random.normal(
                jax.random.fold_in(k, r), (b_l, HOP), jnp.float32
            )
        )(dkeys)  # (T, b_l, HOP)
        noise_rows.append(blocks.transpose(1, 0, 2).reshape(b_l, T * HOP))
    ddsp_noise = jnp.concatenate(noise_rows, axis=0)  # (B, T*HOP)

    from ddsp_svc_tpu.models.ddsp import CombSubSuperFast

    ddsp_module = CombSubSuperFast(SR, HOP, WIN, n_unit=N_UNIT, n_spk=2)
    wav, _, _ = ddsp_module.apply(
        {"params": state.params["ddsp_model"]},
        batch["units"], batch["f0"], batch["volume"], spk_id=batch["spk_id"],
        noise=ddsp_noise, infer=False,
    )
    mel_dense = mel.extract(wav)
    ddsp_loss_dense = jnp.mean((mel_dense - batch["mel"]) ** 2)

    # denoiser half
    sched = linear_schedule(1000)
    c0_tab = jnp.asarray(sched["sqrt_alphas_cumprod"], jnp.float32)
    c1_tab = jnp.asarray(sched["sqrt_one_minus_alphas_cumprod"], jnp.float32)
    spec = (batch["mel"] - (-12.0)) / (2.0 - (-12.0)) * 2.0 - 1.0

    t_rand = jnp.concatenate([
        jax.random.randint(jax.random.fold_in(key_step, r), (b_l,), 0, 100)
        for r in range(dp)
    ])
    noise_f = jnp.stack([
        jnp.stack([
            jax.random.normal(jax.random.fold_in(nkeys[k], r), (b_l, M),
                              jnp.float32)
            for k in range(T)
        ], axis=1).reshape(b_l, T, M)
        for r in range(dp)
    ]).reshape(B, T, M)
    x_noisy = c0_tab[t_rand][:, None, None] * spec \
        + c1_tab[t_rand][:, None, None] * noise_f
    naive = NaiveV2Diff(mel_channels=M, dim=32, num_layers=2,
                        condition_dim=M, use_mlp=False)
    pred = naive.apply(
        {"params": state.params["denoise_fn"]},
        x_noisy, t_rand.astype(jnp.float32), mel_dense,
    )
    diff_loss_dense = jnp.mean((noise_f - pred) ** 2)

    assert abs(float(metrics["ddsp_loss"]) - float(ddsp_loss_dense)) < 2e-4, (
        float(metrics["ddsp_loss"]), float(ddsp_loss_dense))
    assert abs(float(metrics["diff_loss"]) - float(diff_loss_dense)) < 2e-4, (
        float(metrics["diff_loss"]), float(diff_loss_dense))

    # gradient agreement: the psum'd shard_map grads equal the dense grads
    # (catches collective-transpose scaling bugs a loss check cannot see)
    def dense_total(params):
        wav_, _, _ = ddsp_module.apply(
            {"params": params["ddsp_model"]},
            batch["units"], batch["f0"], batch["volume"],
            spk_id=batch["spk_id"], noise=ddsp_noise, infer=False,
        )
        mel_d = mel.extract(wav_)
        pred_ = naive.apply(
            {"params": params["denoise_fn"]},
            c0_tab[t_rand][:, None, None] * spec
            + c1_tab[t_rand][:, None, None] * noise_f,
            t_rand.astype(jnp.float32), mel_d,
        )
        return (jnp.mean((mel_d - batch["mel"]) ** 2)
                + jnp.mean((noise_f - pred_) ** 2))

    g_true = jax.grad(dense_total)(state.params)
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(g_true)[0],
        jax.tree_util.tree_leaves(g_sp),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        err = np.abs(b - a).max() / scale
        assert err < 5e-3, (jax.tree_util.keystr(path), err)
