"""torchfcpe checkpoint -> flax CFNaiveMelPE params (features/fcpe.py).

Source layout (torchfcpe CFNaiveMelPE — the wheel the reference imports at
ddsp/vocoder.py:121-133; its ConformerNaiveEncoder is the same module the
reference vendors at diffusion/model_conformer_naive.py):

  input_stack.0            Conv1d(128, 512, 3)
  input_stack.1            GroupNorm(4, 512)
  input_stack.3            Conv1d(512, 512, 3)
  net.encoder_layers.{i}.conformer.net.{2,4,6}   conv-only conformer module
  norm                     LayerNorm(512)
  output_proj              weight_norm(Linear(512, 360))

Bundled checkpoints wrap the state dict under a 'model' key (handled by
convert/common.load_state_dict).
"""
from __future__ import annotations

from .models import _conformer_module, _conv, _ln, _wn_dense
from .common import load_state_dict


def convert_fcpe_state_dict(sd: dict, prefix: str = "") -> dict:
    n_layers = 0
    while f"{prefix}net.encoder_layers.{n_layers}.conformer.net.2.weight" in sd:
        n_layers += 1
    if n_layers == 0:
        raise ValueError("no CFNaiveMelPE conformer layers found in state dict")
    params = {
        "input_conv0": _conv(sd, prefix + "input_stack.0"),
        "input_norm": _ln(sd, prefix + "input_stack.1"),
        "input_conv1": _conv(sd, prefix + "input_stack.3"),
        "norm": _ln(sd, prefix + "norm"),
        "output_proj": _wn_dense(sd, prefix + "output_proj"),
        "net": {
            f"CFNEncoderLayer_{i}": {
                "ConformerConvModule_0": _conformer_module(
                    sd, prefix + f"net.encoder_layers.{i}.conformer"
                )
            }
            for i in range(n_layers)
        },
    }
    return {"params": params}


def convert_fcpe(ckpt_path: str, out_path: str | None = None) -> None:
    from flax import serialization

    sd = load_state_dict(ckpt_path)
    variables = convert_fcpe_state_dict(sd)
    out_path = out_path or ckpt_path.rsplit(".", 1)[0] + ".msgpack"
    with open(out_path, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))
    print(f" [*] fcpe: {ckpt_path} -> {out_path}")
