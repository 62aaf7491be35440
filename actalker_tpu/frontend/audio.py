"""Host-side audio frontend: Whisper log-mel features in pure numpy.

Parity target: the reference's ``get_audio_feature``
(``src/dataset/test_preprocess.py:121-137``) — librosa 16 kHz load + HF
``WhisperFeatureExtractor`` over 750*640-sample (30 s) windows, concatenated
on the time axis; the frame count is ``len(audio) // 640`` (one mel frame per
hop of 160, two mel frames per 12.5 fps video frame after the encoder's
stride-2 conv).

Implementation is self-contained numpy (no librosa dependency): hann STFT
(n_fft 400, hop 160), slaney-normalized mel filterbank (80 bins, 0-8 kHz),
log10 with Whisper's dynamic-range compression.
"""
from __future__ import annotations

import subprocess
from typing import Tuple

import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
N_MELS = 80
CHUNK_SAMPLES = 480000  # 30 s, == the reference's 750 * 640 window


def load_audio(path: str, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Decode any container to mono float32 PCM (native libav runtime, with
    an ffmpeg-binary fallback, then wav-only scipy)."""
    from actalker_tpu.frontend import media_native

    if media_native.lib() is not None:
        return media_native.decode_audio(path, sr)
    import shutil

    if shutil.which("ffmpeg"):
        cmd = ["ffmpeg", "-nostdin", "-i", path, "-f", "f32le", "-ac", "1",
               "-ar", str(sr), "-"]
        out = subprocess.run(cmd, capture_output=True, check=True).stdout
        return np.frombuffer(out, np.float32).copy()
    if path.endswith(".wav"):
        from scipy.io import wavfile

        rate, data = wavfile.read(path)
        data = data.astype(np.float32)
        if data.ndim > 1:
            data = data.mean(axis=1)
        if data.max() > 2.0:
            data = data / 32768.0
        if rate != sr:
            n = int(len(data) * sr / rate)
            data = np.interp(np.linspace(0, len(data) - 1, n),
                             np.arange(len(data)), data).astype(np.float32)
        return data
    raise RuntimeError(
        "no audio decoder: build runtime/libactalker_media.so (make -C runtime)"
    )


def _hz_to_mel(f):
    # slaney scale
    f = np.asarray(f, np.float64)
    mel = 3.0 * f / 200.0
    log_region = f >= 1000.0
    mel = np.where(
        log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0),
        mel,
    )
    return mel


def _mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f = 200.0 * m / 3.0
    log_region = m >= 15.0
    f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
    return f


def mel_filterbank(sr=SAMPLE_RATE, n_fft=N_FFT, n_mels=N_MELS) -> np.ndarray:
    """(n_mels, n_fft//2+1) slaney-normalized triangular filterbank."""
    fmax = sr / 2
    mels = np.linspace(_hz_to_mel(0.0), _hz_to_mel(fmax), n_mels + 2)
    freqs = _mel_to_hz(mels)
    fft_freqs = np.linspace(0, fmax, n_fft // 2 + 1)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        lower = (fft_freqs - freqs[i]) / (freqs[i + 1] - freqs[i])
        upper = (freqs[i + 2] - fft_freqs) / (freqs[i + 2] - freqs[i + 1])
        fb[i] = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (freqs[2:] - freqs[:-2])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


_FILTERS = None
_NATIVE = None


def _native_lib():
    """ctypes handle to the C++ DSP library (runtime/libactalker_mel.so)."""
    global _NATIVE
    if _NATIVE is None:
        import ctypes
        import os

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "runtime", "libactalker_mel.so",
        )
        try:
            lib = ctypes.CDLL(path)
            lib.whisper_log_mel.restype = ctypes.c_int32
            lib.whisper_log_mel.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
            ]
            _NATIVE = lib
        except OSError:
            _NATIVE = False
    return _NATIVE or None


def _log_mel_native(seg: np.ndarray) -> np.ndarray:
    import ctypes

    lib = _native_lib()
    seg = np.ascontiguousarray(seg, np.float32)
    frames = len(seg) // HOP
    out = np.empty((N_MELS, frames), np.float32)
    got = lib.whisper_log_mel(
        seg.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(seg),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    assert got == frames, (got, frames)
    return out


def log_mel_spectrogram(audio: np.ndarray, pad_to_chunk: bool = True,
                        use_native: bool = True) -> np.ndarray:
    """(T samples,) -> (80, frames) Whisper-style log-mel (fp32).

    With ``pad_to_chunk`` each 30 s window is zero-padded to 3000 frames,
    matching the HF feature extractor used by the reference.
    """
    global _FILTERS
    if _FILTERS is None:
        _FILTERS = mel_filterbank()
    chunks = []
    n = len(audio)
    for start in range(0, max(n, 1), CHUNK_SAMPLES):
        seg = audio[start:start + CHUNK_SAMPLES]
        if pad_to_chunk:
            seg = np.pad(seg, (0, CHUNK_SAMPLES - len(seg)))
        if use_native and _native_lib() is not None:
            chunks.append(_log_mel_native(seg))
            continue
        window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
        frames = 1 + len(seg) // HOP
        seg_p = np.pad(seg, (N_FFT // 2, N_FFT // 2), mode="reflect")
        # frame the signal: (frames, n_fft)
        idx = np.arange(N_FFT)[None, :] + HOP * np.arange(frames)[:, None]
        fr = seg_p[idx] * window[None]
        spec = np.fft.rfft(fr, axis=-1)
        power = (spec.real**2 + spec.imag**2)[:-1]  # whisper drops last frame
        mel = power.astype(np.float32) @ _FILTERS.T
        logm = np.log10(np.maximum(mel, 1e-10))
        logm = np.maximum(logm, logm.max() - 8.0)
        logm = (logm + 4.0) / 4.0
        chunks.append(logm.T)  # (80, frames)
    return np.concatenate(chunks, axis=1)


def whisper_features(audio_path: str) -> Tuple[np.ndarray, int]:
    """Returns (mel (80, T), num_video_frames) like the reference's
    ``get_audio_feature`` (frame count = samples // 640)."""
    audio = load_audio(audio_path)
    return log_mel_spectrogram(audio), len(audio) // 640
