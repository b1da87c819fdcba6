"""Evaluation tower: LPAPS, CLAP text-consistency, FAD, score orchestration.

Rebuild of the reference's ``evals/`` side tower (SURVEY.md §2.3). Eval runs
offline on the host; semantics parity with the reference matters more than
device speed (SURVEY.md §7.8), so feature extraction is pluggable:

- :class:`~audioeditingcode_tpu.evals.features.TransformersClapExtractor`
  uses the torch-CPU CLAP from ``transformers`` as the oracle network
  (the reference uses pip ``laion_clap`` — evals/pretrained_networks.py:12).
- :class:`~audioeditingcode_tpu.evals.features.MelStageExtractor` is a
  weight-free JAX stand-in with the same stage/embedding interface, used by
  the test-suite and available offline.
"""

from .windows import split_to_overlapping_windows, windowed_score
from .lpaps import LPAPS, lpaps_distance
from .clap_consistency import CLAPTextConsistencyMetric
from .fad import frechet_distance, FADScorer
from .features import (
    FlaxClapExtractor,
    MelStageExtractor,
    TransformersClapExtractor,
    default_extractor,
)
from .scores import ScoreState, calc_scores, combine_scores

__all__ = [
    "FlaxClapExtractor",
    "MelStageExtractor",
    "TransformersClapExtractor",
    "default_extractor",
    "ScoreState",
    "calc_scores",
    "combine_scores",
    "split_to_overlapping_windows",
    "windowed_score",
    "LPAPS",
    "lpaps_distance",
    "CLAPTextConsistencyMetric",
    "frechet_distance",
    "FADScorer",
]
