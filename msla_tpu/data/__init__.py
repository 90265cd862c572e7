"""Data pipeline: WAV codec, resampling, Slakh dataset/loader/datamodule,
on-device masking augmentation, native C++ IO fast path."""
from msla_tpu.data.augment import masking_augment
from msla_tpu.data.datamodule import SlakhDataModule
from msla_tpu.data.dataset import SlakhDataset, make_fixture_dataset
from msla_tpu.data.loader import DataLoader
from msla_tpu.data.resample import resample
from msla_tpu.data.transform import Quantize, ToComplex
from msla_tpu.data.wavio import read_wav, write_wav

__all__ = ["DataLoader", "Quantize", "SlakhDataModule", "SlakhDataset", "ToComplex",
           "make_fixture_dataset", "masking_augment", "read_wav", "resample",
           "write_wav"]
