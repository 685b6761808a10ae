"""Converter structural tests for the PCmer (legacy) family + WaveNet."""
import numpy as np

import jax
import jax.numpy as jnp

from ddsp_svc_tpu.convert.common import check_tree_shapes


def rand(shape, rng):
    return rng.standard_normal(shape).astype(np.float32)


def synth_pcmer_unit2control_sd(rng, n_unit, n_out, n_layers=3):
    sd = {}
    pre = "unit2ctrl."
    sd[pre + "stack.0.weight"] = rand((256, n_unit, 3), rng)
    sd[pre + "stack.0.bias"] = rand((256,), rng)
    sd[pre + "stack.1.weight"] = rand((256,), rng)
    sd[pre + "stack.1.bias"] = rand((256,), rng)
    sd[pre + "stack.3.weight"] = rand((256, 256, 3), rng)
    sd[pre + "stack.3.bias"] = rand((256,), rng)
    for emb in ("f0_embed", "phase_embed", "volume_embed"):
        sd[pre + emb + ".weight"] = rand((256, 1), rng)
        sd[pre + emb + ".bias"] = rand((256,), rng)
    nb_features = int(64 * np.log(64))
    for i in range(n_layers):
        lp = pre + f"decoder._layers.{i}."
        for proj in ("to_q", "to_k", "to_v"):
            sd[lp + f"attn.{proj}.weight"] = rand((512, 256), rng)
            sd[lp + f"attn.{proj}.bias"] = rand((512,), rng)
        sd[lp + "attn.to_out.weight"] = rand((256, 512), rng)
        sd[lp + "attn.to_out.bias"] = rand((256,), rng)
        sd[lp + "attn.fast_attention.projection_matrix"] = rand(
            (nb_features, 64), rng
        )
        sd[lp + "norm.weight"] = rand((256,), rng)
        sd[lp + "norm.bias"] = rand((256,), rng)
        sd[lp + "conformer.net.0.weight"] = rand((256,), rng)
        sd[lp + "conformer.net.0.bias"] = rand((256,), rng)
        sd[lp + "conformer.net.2.weight"] = rand((1024, 256, 1), rng)
        sd[lp + "conformer.net.2.bias"] = rand((1024,), rng)
        sd[lp + "conformer.net.4.conv.weight"] = rand((512, 1, 31), rng)
        sd[lp + "conformer.net.4.conv.bias"] = rand((512,), rng)
        sd[lp + "conformer.net.6.weight"] = rand((256, 512, 1), rng)
        sd[lp + "conformer.net.6.bias"] = rand((256,), rng)
    sd[pre + "norm.weight"] = rand((256,), rng)
    sd[pre + "norm.bias"] = rand((256,), rng)
    sd[pre + "dense_out.weight_g"] = rand((n_out, 1), rng)
    sd[pre + "dense_out.weight_v"] = rand((n_out, 256), rng)
    sd[pre + "dense_out.bias"] = rand((n_out,), rng)
    return sd


class TestPcmerConvert:
    def test_sins(self):
        from ddsp_svc_tpu.convert.models import convert_unit2control_pcmer
        from ddsp_svc_tpu.models.ddsp import Sins

        rng = np.random.default_rng(0)
        n_unit, n_harm, n_allpass, n_noise = 16, 8, 8, 8
        sd = synth_pcmer_unit2control_sd(rng, n_unit, n_harm + n_allpass + n_noise)
        u2c_p, u2c_b = convert_unit2control_pcmer(sd, "unit2ctrl.")
        params = {"unit2ctrl": u2c_p}
        buffers = {"unit2ctrl": u2c_b}

        model = Sins(
            sampling_rate=16000, block_size=32, n_harmonics=n_harm,
            n_mag_allpass=n_allpass, n_mag_noise=n_noise, n_unit=n_unit, n_spk=1,
        )
        t = 8
        template = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, t, n_unit)), 220.0 * jnp.ones((1, t, 1)),
            jnp.ones((1, t, 1)),
        )
        problems = check_tree_shapes(params, jax.device_get(template["params"]))
        assert not problems, problems[:10]
        problems_b = check_tree_shapes(buffers, jax.device_get(template["buffers"]))
        assert not problems_b, problems_b[:10]
        sig, _, _ = model.apply(
            {"params": params, "buffers": buffers},
            jnp.zeros((1, t, n_unit)), 220.0 * jnp.ones((1, t, 1)),
            jnp.ones((1, t, 1)), rngs={"noise": jax.random.PRNGKey(2)},
        )
        assert np.isfinite(np.asarray(sig)).all()


class TestWaveNetConvert:
    def test_structure(self):
        from ddsp_svc_tpu.convert.models import convert_wavenet
        from ddsp_svc_tpu.models.wavenet import WaveNet

        rng = np.random.default_rng(1)
        out_dims, n_layers, n_chans, hidden = 8, 2, 16, 4
        sd = {
            "w.input_projection.weight": rand((n_chans, out_dims, 1), rng),
            "w.input_projection.bias": rand((n_chans,), rng),
            "w.mlp.0.weight": rand((n_chans * 4, n_chans), rng),
            "w.mlp.0.bias": rand((n_chans * 4,), rng),
            "w.mlp.2.weight": rand((n_chans, n_chans * 4), rng),
            "w.mlp.2.bias": rand((n_chans,), rng),
            "w.skip_projection.weight": rand((n_chans, n_chans, 1), rng),
            "w.skip_projection.bias": rand((n_chans,), rng),
            "w.output_projection.weight": rand((out_dims, n_chans, 1), rng),
            "w.output_projection.bias": rand((out_dims,), rng),
        }
        for i in range(n_layers):
            lp = f"w.residual_layers.{i}."
            sd[lp + "dilated_conv.weight"] = rand((2 * n_chans, n_chans, 3), rng)
            sd[lp + "dilated_conv.bias"] = rand((2 * n_chans,), rng)
            sd[lp + "diffusion_projection.weight"] = rand((n_chans, n_chans), rng)
            sd[lp + "diffusion_projection.bias"] = rand((n_chans,), rng)
            sd[lp + "conditioner_projection.weight"] = rand((2 * n_chans, hidden, 1), rng)
            sd[lp + "conditioner_projection.bias"] = rand((2 * n_chans,), rng)
            sd[lp + "output_projection.weight"] = rand((2 * n_chans, n_chans, 1), rng)
            sd[lp + "output_projection.bias"] = rand((2 * n_chans,), rng)

        converted = convert_wavenet(sd, "w.", n_layers)
        model = WaveNet(out_dims, n_layers, n_chans, hidden)
        template = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, out_dims)),
            jnp.zeros((1,)), jnp.zeros((1, 8, hidden)),
        )["params"]
        problems = check_tree_shapes(converted, jax.device_get(template))
        assert not problems, problems[:10]
