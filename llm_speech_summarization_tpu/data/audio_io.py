"""Host-side audio IO.

The reference uses librosa (reference: inference.py:166) which is not in
this image; WAV loading + resampling are implemented over scipy instead.
"""

from __future__ import annotations

import numpy as np


def load_wav(path: str, target_sr: int = 16000) -> np.ndarray:
    """Load a WAV file as mono float32 at ``target_sr`` (like
    librosa.load(path, sr=16000), reference: inference.py:166)."""
    from scipy.io import wavfile
    from scipy.signal import resample_poly

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        wav = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        wav = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        wav = (data.astype(np.float32) - 128.0) / 128.0
    else:
        wav = data.astype(np.float32)
    if wav.ndim == 2:
        wav = wav.mean(axis=1)
    if sr != target_sr:
        from math import gcd

        g = gcd(int(sr), int(target_sr))
        wav = resample_poly(wav, target_sr // g, sr // g).astype(np.float32)
    return wav
