"""Observability: TensorBoard summaries, spectrogram/alignment plots, logging.

Counterpart of the reference observability stack (reference
``utils.py:196-283,390-402``): scalar/image/audio summaries, matplotlib-Agg
mel and alignment renderers, and a file logger per model dir.  Uses
``tensorboardX`` (baked in) instead of torch's SummaryWriter.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import numpy as np

_MATPLOTLIB_READY = False


def _ensure_matplotlib():
    global _MATPLOTLIB_READY
    if not _MATPLOTLIB_READY:
        import matplotlib

        matplotlib.use("Agg")
        logging.getLogger("matplotlib").setLevel(logging.WARNING)
        _MATPLOTLIB_READY = True


def plot_spectrogram_to_numpy(spectrogram: np.ndarray) -> np.ndarray:
    """[n_mels, T] → HWC uint8 image (reference ``utils.py:230-253``)."""
    _ensure_matplotlib()
    import matplotlib.pylab as plt

    fig, ax = plt.subplots(figsize=(10, 2))
    im = ax.imshow(spectrogram, aspect="auto", origin="lower", interpolation="none")
    plt.colorbar(im, ax=ax)
    plt.xlabel("Frames")
    plt.ylabel("Channels")
    plt.tight_layout()
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return data


def plot_alignment_to_numpy(alignment: np.ndarray, info: Optional[str] = None) -> np.ndarray:
    """[T_spec, T_text] hard path → HWC uint8 image (reference ``utils.py:256-282``)."""
    _ensure_matplotlib()
    import matplotlib.pylab as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(alignment.T, aspect="auto", origin="lower", interpolation="none")
    fig.colorbar(im, ax=ax)
    xlabel = "Decoder timestep" + (f"\n\n{info}" if info else "")
    plt.xlabel(xlabel)
    plt.ylabel("Encoder timestep")
    plt.tight_layout()
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return data


class SummaryWriter:
    """Thin wrapper: tensorboardX if importable, else JSONL scalars."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        try:
            from tensorboardX import SummaryWriter as TBWriter

            self._tb = TBWriter(log_dir=log_dir)
        except Exception:
            self._tb = None
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def summarize(
        self,
        global_step: int,
        scalars: Optional[Dict[str, float]] = None,
        histograms: Optional[Dict[str, np.ndarray]] = None,
        images: Optional[Dict[str, np.ndarray]] = None,
        audios: Optional[Dict[str, np.ndarray]] = None,
        audio_sampling_rate: int = 22050,
    ) -> None:
        scalars = scalars or {}
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), global_step)
            for k, v in (histograms or {}).items():
                self._tb.add_histogram(k, np.asarray(v), global_step)
            for k, v in (images or {}).items():
                self._tb.add_image(k, v, global_step, dataformats="HWC")
            for k, v in (audios or {}).items():
                try:
                    self._tb.add_audio(
                        k, np.asarray(v).reshape(-1, 1), global_step,
                        sample_rate=audio_sampling_rate,
                    )
                except Exception:
                    # tensorboardX's audio encoder needs soundfile; fall
                    # back to dropping a plain wav next to the event files
                    from personalized_text_to_speech_tpu.data.audio import (
                        save_wav,
                    )

                    safe = k.replace("/", "_")
                    save_wav(
                        os.path.join(
                            self.log_dir, f"{safe}_{global_step}.wav"
                        ),
                        np.asarray(v).reshape(-1),
                        audio_sampling_rate,
                    )
        else:
            import json

            self._jsonl.write(
                json.dumps({"step": global_step, **{k: float(v) for k, v in scalars.items()}})
                + "\n"
            )
            self._jsonl.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()


def get_logger(model_dir: str, filename: str = "train.log") -> logging.Logger:
    """File + console logger per run dir (reference ``utils.py:390-402``)."""
    logger = logging.getLogger(os.path.basename(os.path.abspath(model_dir)))
    logger.setLevel(logging.DEBUG)
    if not logger.handlers:
        os.makedirs(model_dir, exist_ok=True)
        fmt = logging.Formatter("%(asctime)s\t%(name)s\t%(levelname)s\t%(message)s")
        fh = logging.FileHandler(os.path.join(model_dir, filename), encoding="utf-8")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    return logger
