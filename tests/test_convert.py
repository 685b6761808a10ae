"""Converter structural tests: synthetic torch-layout state dicts convert to
trees that exactly match model.init templates (names + shapes)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddsp_svc_tpu.convert.common import check_tree_shapes


def rand(shape, rng):
    return rng.standard_normal(shape).astype(np.float32)


class TestHubertConvert:
    def test_bshall_hubertsoft(self):
        from ddsp_svc_tpu.convert.hubert import convert_hubert_state_dict
        from ddsp_svc_tpu.features.hubert import ENCODER_CONFIGS, HubertModel

        rng = np.random.default_rng(0)
        sd = {}
        conv_shapes = [(512, 1, 10)] + [(512, 512, 3)] * 4 + [(512, 512, 2)] * 2
        for i, s in enumerate(conv_shapes):
            sd[f"feature_extractor.conv{i}.weight"] = rand(s, rng)
        sd["feature_extractor.norm0.weight"] = rand((512,), rng)
        sd["feature_extractor.norm0.bias"] = rand((512,), rng)
        sd["feature_projection.norm.weight"] = rand((512,), rng)
        sd["feature_projection.norm.bias"] = rand((512,), rng)
        sd["feature_projection.projection.weight"] = rand((768, 512), rng)
        sd["feature_projection.projection.bias"] = rand((768,), rng)
        sd["positional_embedding.conv.weight_g"] = rand((1, 1, 128), rng)
        sd["positional_embedding.conv.weight_v"] = rand((768, 48, 128), rng)
        sd["positional_embedding.conv.bias"] = rand((768,), rng)
        sd["norm.weight"] = rand((768,), rng)
        sd["norm.bias"] = rand((768,), rng)
        for i in range(12):
            pre = f"encoder.layers.{i}."
            sd[pre + "self_attn.in_proj_weight"] = rand((2304, 768), rng)
            sd[pre + "self_attn.in_proj_bias"] = rand((2304,), rng)
            sd[pre + "self_attn.out_proj.weight"] = rand((768, 768), rng)
            sd[pre + "self_attn.out_proj.bias"] = rand((768,), rng)
            sd[pre + "linear1.weight"] = rand((3072, 768), rng)
            sd[pre + "linear1.bias"] = rand((3072,), rng)
            sd[pre + "linear2.weight"] = rand((768, 3072), rng)
            sd[pre + "linear2.bias"] = rand((768,), rng)
            for n in ("norm1", "norm2"):
                sd[pre + n + ".weight"] = rand((768,), rng)
                sd[pre + n + ".bias"] = rand((768,), rng)
        sd["proj.weight"] = rand((256, 768), rng)
        sd["proj.bias"] = rand((256,), rng)

        cfg = ENCODER_CONFIGS["hubertsoft"]
        converted = convert_hubert_state_dict(sd, cfg)
        model = HubertModel(cfg)
        template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 800)))
        problems = check_tree_shapes(converted, jax.device_get(template))
        assert not problems, problems[:10]
        # converted params actually run
        out = model.apply(converted, jnp.zeros((1, 800)))
        assert np.isfinite(np.asarray(out)).all()

    def test_fairseq_contentvec(self):
        from ddsp_svc_tpu.convert.hubert import convert_hubert_state_dict
        from ddsp_svc_tpu.features.hubert import ENCODER_CONFIGS, HubertModel

        rng = np.random.default_rng(1)
        sd = {}
        conv_shapes = [(512, 1, 10)] + [(512, 512, 3)] * 4 + [(512, 512, 2)] * 2
        for i, s in enumerate(conv_shapes):
            sd[f"feature_extractor.conv_layers.{i}.0.weight"] = rand(s, rng)
        sd["feature_extractor.conv_layers.0.2.weight"] = rand((512,), rng)
        sd["feature_extractor.conv_layers.0.2.bias"] = rand((512,), rng)
        sd["layer_norm.weight"] = rand((512,), rng)
        sd["layer_norm.bias"] = rand((512,), rng)
        sd["post_extract_proj.weight"] = rand((768, 512), rng)
        sd["post_extract_proj.bias"] = rand((768,), rng)
        sd["encoder.pos_conv.0.weight_g"] = rand((1, 1, 128), rng)
        sd["encoder.pos_conv.0.weight_v"] = rand((768, 48, 128), rng)
        sd["encoder.pos_conv.0.bias"] = rand((768,), rng)
        sd["encoder.layer_norm.weight"] = rand((768,), rng)
        sd["encoder.layer_norm.bias"] = rand((768,), rng)
        for i in range(12):
            pre = f"encoder.layers.{i}."
            for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
                sd[pre + f"self_attn.{p}.weight"] = rand((768, 768), rng)
                sd[pre + f"self_attn.{p}.bias"] = rand((768,), rng)
            sd[pre + "fc1.weight"] = rand((3072, 768), rng)
            sd[pre + "fc1.bias"] = rand((3072,), rng)
            sd[pre + "fc2.weight"] = rand((768, 3072), rng)
            sd[pre + "fc2.bias"] = rand((768,), rng)
            for n in ("self_attn_layer_norm", "final_layer_norm"):
                sd[pre + n + ".weight"] = rand((768,), rng)
                sd[pre + n + ".bias"] = rand((768,), rng)

        cfg = ENCODER_CONFIGS["contentvec768l12"]
        converted = convert_hubert_state_dict(sd, cfg)
        model = HubertModel(cfg)
        template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 800)))
        problems = check_tree_shapes(converted, jax.device_get(template))
        assert not problems, problems[:10]


class TestNsfHifiganConvert:
    def test_tiny_generator(self):
        from ddsp_svc_tpu.convert.nsf_hifigan import convert_nsf_hifigan_state_dict
        from ddsp_svc_tpu.models.nsf_hifigan import Generator

        rng = np.random.default_rng(2)
        config = dict(
            sampling_rate=16000, num_mels=8,
            upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
            upsample_initial_channel=16, resblock="1",
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        )
        sd = {}

        def wn_conv(pre, out, inp, k):
            sd[pre + ".weight_g"] = rand((out, 1, 1), rng)
            sd[pre + ".weight_v"] = rand((out, inp, k), rng)
            sd[pre + ".bias"] = rand((out,), rng)

        def wn_convt(pre, inp, out, k):
            sd[pre + ".weight_g"] = rand((inp, 1, 1), rng)
            sd[pre + ".weight_v"] = rand((inp, out, k), rng)
            sd[pre + ".bias"] = rand((out,), rng)

        wn_conv("conv_pre", 16, 8, 7)
        wn_convt("ups.0", 16, 8, 4)
        wn_convt("ups.1", 8, 4, 4)
        # noise_convs: stage0 k=2*stride(=2*2), stage1 (last) k=1
        sd["noise_convs.0.weight"] = rand((8, 1, 4), rng)
        sd["noise_convs.0.bias"] = rand((8,), rng)
        sd["noise_convs.1.weight"] = rand((4, 1, 1), rng)
        sd["noise_convs.1.bias"] = rand((4,), rng)
        for idx, ch in enumerate((8, 4)):
            for j in range(2):
                wn_conv(f"resblocks.{idx}.convs1.{j}", ch, ch, 3)
                wn_conv(f"resblocks.{idx}.convs2.{j}", ch, ch, 3)
        wn_conv("conv_post", 1, 4, 7)
        sd["m_source.l_linear.weight"] = rand((1, 9), rng)
        sd["m_source.l_linear.bias"] = rand((1,), rng)

        converted = convert_nsf_hifigan_state_dict(sd, config)
        model = Generator(
            sampling_rate=16000, num_mels=8, upsample_rates=(2, 2),
            upsample_kernel_sizes=(4, 4), upsample_initial_channel=16,
            resblock="1", resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
        )
        template = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 12, 8)), 220.0 * jnp.ones((1, 12)),
        )["params"]
        problems = check_tree_shapes(converted, jax.device_get(template))
        assert not problems, problems[:10]
        audio = model.apply(
            {"params": converted}, jnp.zeros((1, 12, 8)),
            220.0 * jnp.ones((1, 12)), key=jax.random.PRNGKey(0),
        )
        assert audio.shape == (1, 48)
        assert np.isfinite(np.asarray(audio)).all()


class TestModelConvert:
    def test_combsub_superfast(self):
        from ddsp_svc_tpu.convert.models import convert_combsub_superfast
        from ddsp_svc_tpu.models.ddsp import CombSubSuperFast

        rng = np.random.default_rng(3)
        n_unit, win, n_out = 16, 64, 4 * (64 // 2 + 1)
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
        for i in range(3):
            cp = pre + f"decoder.encoder_layers.{i}.conformer.net"
            sd[cp + ".2.weight"] = rand((1024, 256, 1), rng)
            sd[cp + ".2.bias"] = rand((1024,), rng)
            sd[cp + ".4.weight"] = rand((512, 1, 31), rng)
            sd[cp + ".4.bias"] = rand((512,), rng)
            sd[cp + ".6.weight"] = rand((256, 512, 1), rng)
            sd[cp + ".6.bias"] = rand((256,), rng)
        sd[pre + "norm.weight"] = rand((256,), rng)
        sd[pre + "norm.bias"] = rand((256,), rng)
        sd[pre + "dense_out.weight_g"] = rand((n_out, 1), rng)
        sd[pre + "dense_out.weight_v"] = rand((n_out, 256), rng)
        sd[pre + "dense_out.bias"] = rand((n_out,), rng)

        converted = convert_combsub_superfast(sd)
        model = CombSubSuperFast(
            sampling_rate=16000, block_size=16, win_length=win,
            n_unit=n_unit, n_spk=1,
        )
        t = 8
        template = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, t, n_unit)), 220.0 * jnp.ones((1, t, 1)),
            jnp.ones((1, t, 1)),
        )["params"]
        problems = check_tree_shapes(converted, jax.device_get(template))
        assert not problems, problems[:10]
        sig, _, _ = model.apply(
            {"params": converted}, jnp.zeros((1, t, n_unit)),
            220.0 * jnp.ones((1, t, 1)), jnp.ones((1, t, 1)),
            rngs={"noise": jax.random.PRNGKey(2)},
        )
        assert np.isfinite(np.asarray(sig)).all()


class TestRmvpeConvert:
    def test_structure(self):
        from ddsp_svc_tpu.convert.rmvpe import convert_rmvpe_state_dict
        from ddsp_svc_tpu.features.rmvpe import E2E0

        rng = np.random.default_rng(4)
        sd = {}

        def bn(pre, ch):
            for n, s in (("weight", ch), ("bias", ch), ("running_mean", ch),
                         ("running_var", ch)):
                sd[pre + "." + n] = (
                    np.abs(rand((s,), rng)) + 0.5 if n == "running_var"
                    else rand((s,), rng)
                )

        def conv_block(pre, cin, cout):
            sd[pre + ".conv.0.weight"] = rand((cout, cin, 3, 3), rng)
            bn(pre + ".conv.1", cout)
            sd[pre + ".conv.3.weight"] = rand((cout, cout, 3, 3), rng)
            bn(pre + ".conv.4", cout)
            if cin != cout:
                sd[pre + ".shortcut.weight"] = rand((cout, cin, 1, 1), rng)
                sd[pre + ".shortcut.bias"] = rand((cout,), rng)

        bn("unet.encoder.bn", 1)
        cin = 1
        for i, cout in enumerate((16, 32, 64, 128, 256)):
            for j in range(4):
                conv_block(f"unet.encoder.layers.{i}.conv.{j}",
                           cin if j == 0 else cout, cout)
            cin = cout
        for i in range(4):
            cin_i, cout_i = (256, 512) if i == 0 else (512, 512)
            for j in range(4):
                conv_block(f"unet.intermediate.layers.{i}.conv.{j}",
                           cin_i if j == 0 else cout_i, cout_i)
        cin = 512
        for i, cout in enumerate((256, 128, 64, 32, 16)):
            sd[f"unet.decoder.layers.{i}.conv1.0.weight"] = rand(
                (cin, cout, 3, 3), rng
            )
            bn(f"unet.decoder.layers.{i}.conv1.1", cout)
            for j in range(4):
                conv_block(f"unet.decoder.layers.{i}.conv2.{j}",
                           cout * 2 if j == 0 else cout, cout)
            cin = cout
        sd["cnn.weight"] = rand((3, 16, 3, 3), rng)
        sd["cnn.bias"] = rand((3,), rng)
        for suffix in ("", "_reverse"):
            sd[f"fc.0.gru.weight_ih_l0{suffix}"] = rand((768, 384), rng)
            sd[f"fc.0.gru.weight_hh_l0{suffix}"] = rand((768, 256), rng)
            sd[f"fc.0.gru.bias_ih_l0{suffix}"] = rand((768,), rng)
            sd[f"fc.0.gru.bias_hh_l0{suffix}"] = rand((768,), rng)
        sd["fc.1.weight"] = rand((360, 512), rng)
        sd["fc.1.bias"] = rand((360,), rng)

        converted = convert_rmvpe_state_dict(sd)
        model = E2E0()
        template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 128)))
        problems = check_tree_shapes(converted, jax.device_get(template))
        assert not problems, problems[:20]


class TestHubertLargeLayout:
    def test_layer_norm_extractor_matches_torch(self):
        """HuBERT-Large conv extractor (fairseq extractor_mode='layer_norm':
        biased convs + per-layer channel LayerNorm) vs a torch mirror."""
        import torch

        from ddsp_svc_tpu.features.hubert import FeatureExtractor

        rng = np.random.default_rng(3)
        model = FeatureExtractor(layer_norm_mode=True)
        audio = (0.3 * rng.standard_normal((1, 2000))).astype(np.float32)
        params = model.init(jax.random.PRNGKey(1), jnp.asarray(audio))
        ours = np.asarray(model.apply(params, jnp.asarray(audio)))

        x = torch.from_numpy(audio).unsqueeze(1)
        p = jax.device_get(params)["params"]
        specs = [(10, 5), (3, 2), (3, 2), (3, 2), (3, 2), (2, 2), (2, 2)]
        with torch.no_grad():
            for i, (k, s) in enumerate(specs):
                w = p[f"conv{i}"]["kernel"]  # (k, cin, cout)
                conv = torch.nn.Conv1d(w.shape[1], w.shape[2], k, s)
                conv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0).copy()))
                conv.bias.copy_(torch.from_numpy(p[f"conv{i}"]["bias"]))
                x = conv(x)
                ln = torch.nn.LayerNorm(512)
                ln.weight.copy_(torch.from_numpy(p[f"norm{i}"]["scale"]))
                ln.bias.copy_(torch.from_numpy(p[f"norm{i}"]["bias"]))
                x = ln(x.transpose(1, 2)).transpose(1, 2)
                x = torch.nn.functional.gelu(x)
        theirs = x.transpose(1, 2).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)

    def test_fairseq_large_conversion(self):
        """hubertlarge1024l24: layer_norm extractor keys + pre-norm encoder
        (final norm skipped at an explicit output_layer) convert and run."""
        from ddsp_svc_tpu.convert.hubert import convert_hubert_state_dict
        from ddsp_svc_tpu.features.hubert import ENCODER_CONFIGS, HubertModel

        rng = np.random.default_rng(5)
        d, ffn, heads, layers = 1024, 4096, 16, 24
        sd = {}
        conv_shapes = [(512, 1, 10)] + [(512, 512, 3)] * 4 + [(512, 512, 2)] * 2
        for i, s in enumerate(conv_shapes):
            sd[f"feature_extractor.conv_layers.{i}.0.weight"] = rand(s, rng)
            sd[f"feature_extractor.conv_layers.{i}.0.bias"] = rand((512,), rng)
            sd[f"feature_extractor.conv_layers.{i}.2.1.weight"] = rand((512,), rng)
            sd[f"feature_extractor.conv_layers.{i}.2.1.bias"] = rand((512,), rng)
        sd["layer_norm.weight"] = rand((512,), rng)
        sd["layer_norm.bias"] = rand((512,), rng)
        sd["post_extract_proj.weight"] = rand((d, 512), rng)
        sd["post_extract_proj.bias"] = rand((d,), rng)
        sd["encoder.pos_conv.0.weight_g"] = rand((1, 1, 128), rng)
        sd["encoder.pos_conv.0.weight_v"] = rand((d, d // 16, 128), rng)
        sd["encoder.pos_conv.0.bias"] = rand((d,), rng)
        sd["encoder.layer_norm.weight"] = rand((d,), rng)
        sd["encoder.layer_norm.bias"] = rand((d,), rng)
        for i in range(layers):
            pre = f"encoder.layers.{i}."
            for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
                sd[pre + f"self_attn.{p}.weight"] = rand((d, d), rng)
                sd[pre + f"self_attn.{p}.bias"] = rand((d,), rng)
            sd[pre + "fc1.weight"] = rand((ffn, d), rng)
            sd[pre + "fc1.bias"] = rand((ffn,), rng)
            sd[pre + "fc2.weight"] = rand((d, ffn), rng)
            sd[pre + "fc2.bias"] = rand((d,), rng)
            for n in ("self_attn_layer_norm", "final_layer_norm"):
                sd[pre + n + ".weight"] = rand((d,), rng)
                sd[pre + n + ".bias"] = rand((d,), rng)

        cfg = ENCODER_CONFIGS["hubertlarge1024l24"]
        converted = convert_hubert_state_dict(sd, cfg)
        model = HubertModel(cfg)
        template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 800)))
        # the converter also carries encoder.layer_norm as 'norm' — unused
        # at an explicit output_layer (flax ignores extras); drop it for
        # the shape check
        check = dict(converted["params"])
        check.pop("norm", None)
        problems = check_tree_shapes(
            {"params": check}, jax.device_get(template)
        )
        assert not problems, problems[:10]
        out = model.apply(converted, jnp.zeros((1, 800)))
        assert out.shape[-1] == d and np.isfinite(np.asarray(out)).all()
