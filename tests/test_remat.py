"""Rematerialization: identical gradients with/without jax.checkpoint on
the denoiser layers (the HBM <-> FLOPs lever)."""
import numpy as np

import jax
import jax.numpy as jnp


def grads_equal(m0, m1, init_args, apply_args):
    v = m0.init(jax.random.PRNGKey(2), *init_args)

    def loss(m, p):
        return jnp.sum(m.apply(p, *apply_args) ** 2)

    g0 = jax.grad(lambda p: loss(m0, p))(v)
    g1 = jax.grad(lambda p: loss(m1, p))(v)
    return max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1))
    )


def test_naive_v2_diff_remat_grads():
    from ddsp_svc_tpu.models.naive_v2_diff import NaiveV2Diff

    kw = dict(mel_channels=8, dim=16, num_layers=2, condition_dim=8, use_mlp=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 12, 8))
    t = jnp.ones((1,))
    c = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 8))
    d = grads_equal(NaiveV2Diff(**kw), NaiveV2Diff(**kw, remat=True),
                    (x, t, c), (x, t, c))
    assert d == 0.0, d


def test_wavenet_remat_grads():
    from ddsp_svc_tpu.models.wavenet import WaveNet

    kw = dict(in_dims=8, n_layers=3, n_chans=16, n_hidden=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 12, 8))
    t = jnp.ones((1,))
    c = jax.random.normal(jax.random.PRNGKey(1), (1, 12, 4))
    d = grads_equal(WaveNet(**kw), WaveNet(**kw, remat=True), (x, t, c), (x, t, c))
    assert d == 0.0, d


def test_cascade_trains_with_remat():
    from ddsp_svc_tpu.models.cascade import Unit2WavFast
    from ddsp_svc_tpu.ops.mel import LogMelSpectrogram
    from ddsp_svc_tpu.train.state import create_train_state
    from ddsp_svc_tpu.train.steps import make_cascade_train_step

    model = Unit2WavFast(16000, 64, 256, 16, 1, out_dims=16, n_layers=2,
                         n_chans=32, k_step_max=50, remat=True)
    mel = LogMelSpectrogram(sr=16000, n_mels=16, n_fft=256, win_size=256,
                            hop_length=64, fmin=40.0, fmax=7000.0)
    b, t = 2, 16
    key = jax.random.PRNGKey(0)
    batch = {
        "units": jax.random.normal(key, (b, t, 16)),
        "f0": 220.0 * jnp.ones((b, t, 1)),
        "volume": 0.5 * jnp.ones((b, t, 1)),
        "spk_id": jnp.ones((b, 1), jnp.int32),
        "mel": jax.random.normal(key, (b, t, 16)),
    }
    variables = model.init(
        {"params": key, "noise": key}, batch["units"], batch["f0"],
        batch["volume"], mel_extract_fn=mel.extract, gt_spec=batch["mel"],
        infer=False, k_step=50, key=key,
    )
    state = create_train_state(model, variables["params"], lr=1e-4)
    step = make_cascade_train_step(mel.extract, k_step_max=50, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
