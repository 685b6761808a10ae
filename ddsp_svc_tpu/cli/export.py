"""Model export — the TPU-native analogue of diffusion/onnx_export.py.

Exports the jitted forward of a checkpointed model as a serialized
jax.export artifact (StableHLO): portable, versioned, reloadable with
jax.export.deserialize and runnable on any JAX backend.

python -m ddsp_svc_tpu.cli.export -m exp/model_10000.ckpt -o model.stablehlo \\
    [--seconds 2.0] [--mlir model.mlir.txt]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
from jax import export as jexport

from ..models.registry import load_model
from ..train.solver import model_family


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--seconds", type=float, default=2.0)
    p.add_argument("--mlir", default=None)
    cmd = p.parse_args(argv)

    from .common import enable_compile_cache

    enable_compile_cache()

    model, variables, args = load_model(cmd.model_path)
    family = model_family(args.model.type)
    t = int(cmd.seconds * args.data.sampling_rate) // args.data.block_size
    n_unit = args.data.encoder_out_channels

    pure_diffusion = args.model.type == "Diffusion"  # Unit2Mel
    if family == "ddsp":
        def fwd(params, units, f0, volume, spk_id, key):
            signal, _, _ = model.apply(
                {"params": params}, units, f0, volume,
                spk_id=spk_id, infer=True, rngs={"noise": key},
            )
            return signal
    elif pure_diffusion:
        # Unit2Mel conditions its shallow start on an INPUT mel — export it
        # as a real argument (diffusion/onnx_export.py exports the same
        # gt_spec input)
        def fwd(params, units, f0, volume, spk_id, key, gt_spec):
            return model.apply(
                {"params": params}, units, f0, volume, key=key,
                gt_spec=gt_spec, spk_id=spk_id, infer=True,
                rngs={"noise": key},
            )
    else:
        # cascades extract their own ddsp mel — the extractor must be part
        # of the exported graph or the denoiser samples around silence
        from .common import build_mel_extractor

        mel_x = build_mel_extractor(args)

        def fwd(params, units, f0, volume, spk_id, key):
            return model.apply(
                {"params": params}, units, f0, volume, key=key,
                mel_extract_fn=mel_x.extract, spk_id=spk_id, infer=True,
                rngs={"noise": key},
            )

    specs = [
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables["params"]
        ),
        jax.ShapeDtypeStruct((1, t, n_unit), jnp.float32),
        jax.ShapeDtypeStruct((1, t, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, t, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.int32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    ]
    if pure_diffusion:
        n_mels = getattr(model, "out_dims", 128)
        specs.append(jax.ShapeDtypeStruct((1, t, n_mels), jnp.float32))
    exported = jexport.export(jax.jit(fwd))(*specs)
    data = exported.serialize()
    with open(cmd.output, "wb") as f:
        f.write(data)
    print(f"Exported {args.model.type} ({t} frames) -> {cmd.output} "
          f"({len(data) / 1e6:.2f} MB)")
    if cmd.mlir:
        with open(cmd.mlir, "w") as f:
            f.write(exported.mlir_module())
        print(f"MLIR -> {cmd.mlir}")


if __name__ == "__main__":
    main()
