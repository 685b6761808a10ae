"""Tests for cascade models and NSF-HiFiGAN (tiny configs)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ddsp_svc_tpu.models.cascade import ReflowUnit2Wav, Unit2Mel, Unit2Wav, Unit2WavFast
from ddsp_svc_tpu.models.nsf_hifigan import (
    Generator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)

B, T, UNIT, M = 2, 12, 64, 32
SR, BLOCK, WIN = 44100, 512, 2048


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    units = jnp.asarray(rng.standard_normal((B, T, UNIT)).astype(np.float32))
    f0 = jnp.asarray((220 + 100 * rng.random((B, T, 1))).astype(np.float32))
    vol = jnp.asarray(rng.random((B, T, 1)).astype(np.float32) * 0.5)
    spk = jnp.ones((B, 1), jnp.int32)
    mel = jnp.asarray((-6 + 3 * rng.standard_normal((B, T, M))).astype(np.float32))
    return units, f0, vol, spk, mel


def _fake_mel_extract(wav):
    # stand-in mel extractor with the right frame count (B, L) -> (B, T, M)
    b, l = wav.shape
    frames = wav.reshape(b, l // BLOCK, BLOCK)
    feats = jnp.einsum("btk,km->btm", frames, jnp.ones((BLOCK, M)) / BLOCK)
    return jnp.tanh(feats) - 6.0


RNGS = {
    "params": jax.random.PRNGKey(0),
    "noise": jax.random.PRNGKey(1),
    "diffusion": jax.random.PRNGKey(2),
}
APPLY_RNGS = {"noise": jax.random.PRNGKey(3), "diffusion": jax.random.PRNGKey(4)}


def test_unit2mel_train_and_infer():
    units, f0, vol, spk, mel = _inputs()
    model = Unit2Mel(UNIT, n_spk=2, out_dims=M, n_layers=2, n_chans=48, n_hidden=32,
                     k_step_max=100)
    variables = model.init(RNGS, units, f0, vol, spk_id=spk, gt_spec=mel, infer=False,
                           k_step=100)
    loss = model.apply(variables, units, f0, vol, spk_id=spk, gt_spec=mel, infer=False,
                       k_step=100, rngs=APPLY_RNGS)
    assert np.isfinite(float(loss))
    out = model.apply(variables, units, f0, vol, spk_id=spk, gt_spec=mel, infer=True,
                      k_step=100, infer_speedup=20, rngs=APPLY_RNGS)
    assert out.shape == (B, T, M)


def test_unit2wavfast_train_and_infer():
    units, f0, vol, spk, mel = _inputs()
    model = Unit2WavFast(SR, BLOCK, WIN, UNIT, n_spk=1, out_dims=M, n_layers=2,
                         n_chans=48, k_step_max=100)
    variables = model.init(RNGS, units, f0, vol, spk_id=spk,
                           mel_extract_fn=_fake_mel_extract, gt_spec=mel, infer=False,
                           k_step=100)
    ddsp_loss, diff_loss = model.apply(
        variables, units, f0, vol, spk_id=spk, mel_extract_fn=_fake_mel_extract,
        gt_spec=mel, infer=False, k_step=100, rngs=APPLY_RNGS,
    )
    assert np.isfinite(float(ddsp_loss)) and np.isfinite(float(diff_loss))
    out = model.apply(
        variables, units, f0, vol, spk_id=spk, mel_extract_fn=_fake_mel_extract,
        infer=True, k_step=100, infer_speedup=20, rngs=APPLY_RNGS,
    )
    assert out.shape == (B, T, M)


def test_unit2wav_new_train():
    units, f0, vol, spk, mel = _inputs()
    model = Unit2Wav(SR, BLOCK, UNIT, n_spk=1, out_dims=M, n_layers=2, n_chans=48,
                     k_step_max=100)
    variables = model.init(RNGS, units, f0, vol, spk_id=spk,
                           mel_extract_fn=_fake_mel_extract, gt_spec=mel, infer=False,
                           k_step=100)
    ddsp_loss, diff_loss = model.apply(
        variables, units, f0, vol, spk_id=spk, mel_extract_fn=_fake_mel_extract,
        gt_spec=mel, infer=False, k_step=100, rngs=APPLY_RNGS,
    )
    assert np.isfinite(float(ddsp_loss)) and np.isfinite(float(diff_loss))


def test_reflow_cascade_train_and_infer():
    units, f0, vol, spk, mel = _inputs()
    model = ReflowUnit2Wav(SR, BLOCK, WIN, UNIT, n_spk=1, out_dims=M, n_layers=2,
                           n_chans=48)
    variables = model.init(RNGS, units, f0, vol, spk_id=spk,
                           mel_extract_fn=_fake_mel_extract, gt_spec=mel, infer=False,
                           t_start=0.7)
    ddsp_loss, reflow_loss = model.apply(
        variables, units, f0, vol, spk_id=spk, mel_extract_fn=_fake_mel_extract,
        gt_spec=mel, infer=False, t_start=0.7, rngs=APPLY_RNGS,
    )
    assert np.isfinite(float(ddsp_loss)) and np.isfinite(float(reflow_loss))
    out = model.apply(
        variables, units, f0, vol, spk_id=spk, mel_extract_fn=_fake_mel_extract,
        infer=True, infer_step=4, sampler="euler", t_start=0.7, rngs=APPLY_RNGS,
    )
    assert out.shape == (B, T, M)


def test_nsf_hifigan_generator():
    rng = np.random.default_rng(1)
    mel = jnp.asarray((-6 + 3 * rng.standard_normal((B, T, 16))).astype(np.float32))
    f0 = jnp.asarray((220 + 50 * rng.random((B, T))).astype(np.float32))
    gen = Generator(
        sampling_rate=SR, num_mels=16,
        upsample_rates=(8, 8, 2, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4, 4),
        upsample_initial_channel=32,
    )
    variables = gen.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                         mel, f0)
    audio = gen.apply(variables, mel, f0, rngs={"noise": jax.random.PRNGKey(2)})
    assert audio.shape == (B, T * 512)
    assert np.isfinite(np.asarray(audio)).all()
    assert np.abs(np.asarray(audio)).max() <= 1.0


def test_discriminators_and_gan_losses():
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.standard_normal((B, 4096)).astype(np.float32) * 0.1)
    y_hat = jnp.asarray(rng.standard_normal((B, 4096)).astype(np.float32) * 0.1)

    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    v = mpd.init(jax.random.PRNGKey(0), y, y_hat)
    r, g, fr, fg = mpd.apply(v, y, y_hat)
    d_loss = discriminator_loss(r, g)
    g_loss = generator_loss(g)
    f_loss = feature_loss(fr, fg)
    assert all(np.isfinite(float(x)) for x in (d_loss, g_loss, f_loss))

    msd = MultiScaleDiscriminator()
    v = msd.init(jax.random.PRNGKey(0), y, y_hat)
    r, g, fr, fg = msd.apply(v, y, y_hat)
    assert np.isfinite(float(discriminator_loss(r, g)))


@pytest.mark.slow
def test_vocoder_gan_step_data_parallel():
    """The vocoder GAN train steps run with the batch sharded over the full
    virtual mesh (params replicated — XLA inserts the grad all-reduce), the
    cli.train_vocoder data-parallel recipe."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ddsp_svc_tpu.models.nsf_hifigan import Generator
    from ddsp_svc_tpu.ops.mel import LogMelSpectrogram
    from ddsp_svc_tpu.train.vocoder_solver import (
        init_vocoder_training,
        make_vocoder_train_steps,
    )

    sr, hop, m = 16000, 64, 8
    gen = Generator(
        sampling_rate=sr, num_mels=m, upsample_rates=(4, 4, 4),
        upsample_kernel_sizes=(8, 8, 8), upsample_initial_channel=16,
        resblock="1", resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    mel_x = LogMelSpectrogram(sr=sr, n_mels=m, n_fft=256, win_size=256,
                              hop_length=hop, fmin=40, fmax=7000)
    b, t = 8, 16
    state_g, state_d, disc = init_vocoder_training(
        gen, jnp.zeros((1, t, m)), jnp.zeros((1, t, 1)),
        jax.random.PRNGKey(0),
    )
    mesh = Mesh(np.array(jax.devices()), ("data",))
    repl, rows = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))
    state_g = jax.device_put(state_g, repl)
    state_d = jax.device_put(state_d, repl)
    disc_step, gen_step = make_vocoder_train_steps(gen, disc, mel_x.extract)
    rng = np.random.default_rng(0)
    batch = {
        "mel": jax.device_put(
            jnp.asarray(rng.standard_normal((b, t, m)), jnp.float32), rows
        ),
        "f0": jax.device_put(220.0 * jnp.ones((b, t, 1), jnp.float32), rows),
        "audio": jax.device_put(
            jnp.asarray(0.1 * rng.standard_normal((b, t * hop)), jnp.float32),
            rows,
        ),
    }
    state_d, md = disc_step(state_d, state_g.params, batch,
                            jax.random.PRNGKey(1))
    state_g, mg = gen_step(state_g, state_d.params, batch,
                           jax.random.PRNGKey(2))
    assert np.isfinite(float(md["disc_loss"]))
    assert np.isfinite(float(mg["gen_loss"]))


def test_vocoder_fused_auto_resolves_by_backend(monkeypatch):
    """Vocoder(use_pallas_resblock='auto') keeps the stock XLA path on CPU
    (Pallas compiles for TPU only) and an identical param tree either way."""
    import jax

    from ddsp_svc_tpu.models.vocoder import Vocoder

    v_auto = Vocoder("nsf-hifigan")
    assert jax.default_backend() == "cpu"
    assert v_auto.model.use_pallas_resblock is False
    v_on = Vocoder("nsf-hifigan", use_pallas_resblock=True)
    assert v_on.model.use_pallas_resblock is True
    assert jax.tree.structure(v_auto.params) == jax.tree.structure(v_on.params)
