# Authoritative drop-in API of the phred reduction, mirroring the
# reference's native-module stub
# (/root/reference/src/fastqdedup/_fastq.pyi:17-21).
from typing import Optional

import numpy as np

DEFAULT_PHRED_OFFSET: int
MAXIMUM_PHRED_SCORE: int

def average_error_rate(
    phred_scores: str, *, phred_offset: int = ...) -> float: ...

def validate_phred_array(
    scores: np.ndarray,
    phred_offset: int = ...,
    mask: Optional[np.ndarray] = ...,
) -> None: ...

def ragged_average_error_rate(
    qual_data: np.ndarray,
    offsets: np.ndarray,
    phred_offset: int = ...,
) -> np.ndarray: ...

def batch_average_error_rate(
    scores: np.ndarray,
    lengths: np.ndarray,
    phred_offset: int = ...,
    validate: bool = ...,
) -> np.ndarray: ...
