"""Wire codecs shared by the serving engines.

G.711-style μ-law companding (μ=255) — ONE definition for the four sites
that must stay bit-consistent: the synthesis batcher's on-device output
encode + host decode (infer/batcher.py) and the fused front-end's host
input encode + in-graph decode (infer/enc_batcher.py). Matches
flask-era telephony semantics: ~38 dB SNR on speech-scale signals, one
byte per sample. ``xp`` selects numpy (host staging/decode) or
jax.numpy (inside jitted graphs).
"""
from __future__ import annotations

import numpy as np

_LOG256 = float(np.log(256.0))


def mulaw_encode_u8(x, xp=np):
    """float audio in [-1, 1] -> uint8 companded code (128 = zero)."""
    y = xp.sign(x) * (xp.log1p(255.0 * xp.minimum(xp.abs(x), 1.0))
                      / _LOG256)
    return xp.clip(xp.rint((y + 1.0) * 127.5), 0.0, 255.0).astype(
        xp.uint8 if xp is np else "uint8")


def mulaw_decode(code, xp=np):
    """uint8 companded code -> float32 audio."""
    y = code.astype(xp.float32) / 127.5 - 1.0
    return xp.sign(y) * ((256.0 ** xp.abs(y) - 1.0) / 255.0)


def mulaw_step(ref, xp=np):
    """One companding step at each sample's level — the tolerance a
    μ-law round trip is allowed (tests / equality checks)."""
    return _LOG256 / 255.0 * (1.0 / 255.0 + xp.abs(ref))
