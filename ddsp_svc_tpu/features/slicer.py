"""RMS-threshold silence slicer (reference slicer.py:1-117 behavior).

librosa-free: the frame RMS (librosa.feature.rms, center=True, constant pad)
is computed with a vectorized sliding window. The silence state machine and
the returned {idx: {"slice": bool, "split_time": "a,b"}} contract match the
reference exactly so downstream splicing code carries over.
"""
from __future__ import annotations

import numpy as np


def frame_rms(y: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    """librosa.feature.rms parity: center-pad by frame_length//2 (constant),
    frame, sqrt(mean(x^2))."""
    pad = frame_length // 2
    yp = np.pad(y.astype(np.float64), (pad, pad))
    n_frames = 1 + (len(yp) - frame_length) // hop_length
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    return np.sqrt((yp[idx] ** 2).mean(axis=1)).astype(np.float32)


class Slicer:
    def __init__(
        self,
        sr: int,
        threshold: float = -40.0,
        min_length: int = 5000,
        min_interval: int = 300,
        hop_size: int = 20,
        max_sil_kept: int = 5000,
    ):
        if not min_length >= min_interval >= hop_size:
            raise ValueError("min_length >= min_interval >= hop_size required")
        if not max_sil_kept >= hop_size:
            raise ValueError("max_sil_kept >= hop_size required")
        min_interval_samples = sr * min_interval / 1000
        self.threshold = 10 ** (threshold / 20.0)
        self.hop_size = round(sr * hop_size / 1000)
        self.win_size = min(round(min_interval_samples), 4 * self.hop_size)
        self.min_length = round(sr * min_length / 1000 / self.hop_size)
        self.min_interval = round(min_interval_samples / self.hop_size)
        self.max_sil_kept = round(sr * max_sil_kept / 1000 / self.hop_size)

    def slice(self, waveform: np.ndarray) -> dict:
        samples = waveform.mean(axis=0) if waveform.ndim > 1 else waveform
        if samples.shape[0] <= self.min_length:
            return {"0": {"slice": False, "split_time": f"0,{len(waveform)}"}}
        rms_list = frame_rms(samples, self.win_size, self.hop_size)

        sil_tags: list[tuple[int, int]] = []
        silence_start = None
        clip_start = 0
        for i, rms in enumerate(rms_list):
            if rms < self.threshold:
                if silence_start is None:
                    silence_start = i
                continue
            if silence_start is None:
                continue
            is_leading_silence = silence_start == 0 and i > self.max_sil_kept
            need_slice_middle = (
                i - silence_start >= self.min_interval
                and i - clip_start >= self.min_length
            )
            if not is_leading_silence and not need_slice_middle:
                silence_start = None
                continue
            if i - silence_start <= self.max_sil_kept:
                pos = int(rms_list[silence_start : i + 1].argmin()) + silence_start
                sil_tags.append((0, pos) if silence_start == 0 else (pos, pos))
                clip_start = pos
            elif i - silence_start <= self.max_sil_kept * 2:
                pos = int(
                    rms_list[i - self.max_sil_kept : silence_start + self.max_sil_kept + 1].argmin()
                ) + i - self.max_sil_kept
                pos_l = int(
                    rms_list[silence_start : silence_start + self.max_sil_kept + 1].argmin()
                ) + silence_start
                pos_r = int(rms_list[i - self.max_sil_kept : i + 1].argmin()) + i - self.max_sil_kept
                if silence_start == 0:
                    sil_tags.append((0, pos_r))
                    clip_start = pos_r
                else:
                    sil_tags.append((min(pos_l, pos), max(pos_r, pos)))
                    clip_start = max(pos_r, pos)
            else:
                pos_l = int(
                    rms_list[silence_start : silence_start + self.max_sil_kept + 1].argmin()
                ) + silence_start
                pos_r = int(rms_list[i - self.max_sil_kept : i + 1].argmin()) + i - self.max_sil_kept
                sil_tags.append((0, pos_r) if silence_start == 0 else (pos_l, pos_r))
                clip_start = pos_r
            silence_start = None

        total_frames = rms_list.shape[0]
        if silence_start is not None and total_frames - silence_start >= self.min_interval:
            silence_end = min(total_frames, silence_start + self.max_sil_kept)
            pos = int(rms_list[silence_start : silence_end + 1].argmin()) + silence_start
            sil_tags.append((pos, total_frames + 1))

        if not sil_tags:
            return {"0": {"slice": False, "split_time": f"0,{len(waveform)}"}}
        chunks = []
        if sil_tags[0][0]:
            chunks.append(
                {"slice": False,
                 "split_time": f"0,{min(waveform.shape[0], sil_tags[0][0] * self.hop_size)}"}
            )
        for i in range(len(sil_tags)):
            if i:
                chunks.append(
                    {"slice": False,
                     "split_time": f"{sil_tags[i - 1][1] * self.hop_size},"
                                   f"{min(waveform.shape[0], sil_tags[i][0] * self.hop_size)}"}
                )
            chunks.append(
                {"slice": True,
                 "split_time": f"{sil_tags[i][0] * self.hop_size},"
                               f"{min(waveform.shape[0], sil_tags[i][1] * self.hop_size)}"}
            )
        if sil_tags[-1][1] * self.hop_size < len(waveform):
            chunks.append(
                {"slice": False,
                 "split_time": f"{sil_tags[-1][1] * self.hop_size},{len(waveform)}"}
            )
        return {str(i): c for i, c in enumerate(chunks)}


def split_audio(audio: np.ndarray, sr: int, db_thresh: float = -40, min_len: int = 5000):
    """Slice + materialize segments (main.py:123-139 'split' semantics).

    Returns list of (start_sample, segment) for non-silent chunks.
    """
    chunks = Slicer(sr=sr, threshold=db_thresh, min_length=min_len).slice(audio)
    result = []
    for v in chunks.values():
        tag = v["split_time"].split(",")
        if int(tag[0]) != int(tag[1]) and not v["slice"]:
            start = int(tag[0])
            result.append((start, audio[start : int(tag[1])]))
    return result
