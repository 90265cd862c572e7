"""Shared audio-demo table logging.

All three task modules log the same per-epoch demo on the first validation
batch (reference: vqvae.py:173-237, transformer.py:143-204, bert.py:169-232):
original vs decoded WAVs per stem plus the mixed song, as a 5-column table.
This helper holds the single implementation; tasks supply only `decoded`.
"""
from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

INSTRUMENTS = ("bass", "drums", "guitar", "piano")
DEMO_COLUMNS = ["bass vs D(bass)", "drums vs D(drums)", "guitar vs D(guitar)",
                "piano vs D(piano)", "mixed vs D(mixed)"]


def log_audio_demo(trainer, checkpoint_dir: str, sample_rate: int,
                   original: np.ndarray, decoded, task_name: str) -> None:
    """Write original/generated WAVs for one sample and log the demo table.

    original: (4, T) stems; decoded: (4, T) array OR a zero-arg callable
    producing it (so the demo forward runs under the same guard). Never
    raises — demo failures must not kill training (reference: vqvae.py:233-237).
    """
    try:
        from msla_tpu.parallel.mesh import is_main_process

        if not is_main_process():  # multi-host: rank 0 owns artifact writes
            return
        if callable(decoded):
            decoded = decoded()
        from msla_tpu.data.wavio import write_wav

        ckpt_dir = Path(checkpoint_dir)
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        data: list[list] = [[], []]
        for idx, name in enumerate(INSTRUMENTS):
            orig_file = ckpt_dir / f"original_{name}.wav"
            dec_file = ckpt_dir / f"generated_{name}.wav"
            write_wav(orig_file, original[idx], sample_rate)
            write_wav(dec_file, decoded[idx], sample_rate)
            data[0].append(str(orig_file))
            data[1].append(str(dec_file))
        orig_full = ckpt_dir / "original_full_song.wav"
        dec_full = ckpt_dir / "generated_full_song.wav"
        write_wav(orig_full, original.sum(axis=0), sample_rate)
        write_wav(dec_full, decoded.sum(axis=0), sample_rate)
        data[0].append(str(orig_full))
        data[1].append(str(dec_full))
        for lg in trainer.loggers:
            lg.log_table(f"DEMO EPOCH [{trainer.current_epoch}]", DEMO_COLUMNS, data)
    except Exception as err:
        log.warning("Exception while executing -on validation batch end- during "
                    "%s training", task_name)
        log.warning("%s", err)
