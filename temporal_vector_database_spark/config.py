"""Engine configuration.

Defaults mirror the reference's constants so semantics are comparable:

- ``sparsity_threshold`` 0.01 — delta keeps dims with ``abs(change) >=``
  threshold (reference ``core/delta_computer.py:19,65``).
- ``max_delta_ratio`` 0.8 — warn threshold for dense deltas
  (``core/delta_computer.py:68-72``).
- ``base_snapshot_interval`` 10 — promotion rule: base when
  ``(seq-1) % interval == 0`` → bases at 1, I+1, 2I+1, …
  (``storage/temporal_database.py:30,384-386``).
- ``base_promotion_sparsity_threshold`` 0.7 — promote when the changed-dim
  fraction is strictly greater (``storage/temporal_database.py:388-402``).
- ``base_gap_factor`` 2 — promote when the gap since the last base exceeds
  ``2 * interval`` (``storage/temporal_database.py:404-411``). Note: with
  the interval rule active this rule is provably unreachable (the interval
  rule caps the gap at ``interval``); kept for parity.
- reconstruction-quality constants ``max_chain_length`` 15,
  ``error_accumulation_rate`` 0.0005, ``quality_threshold`` 0.95
  (``core/reconstruction_service.py:57-59``).
- advisor cost bar 10 (``core/delta_computer.py:260``,
  ``storage/temporal_database.py:444``).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class TVDBConfig:
    sparsity_threshold: float = 0.01
    max_delta_ratio: float = 0.8
    base_snapshot_interval: int = 10
    base_promotion_sparsity_threshold: float = 0.7
    base_gap_factor: int = 2
    max_chain_length: int = 15
    error_accumulation_rate: float = 0.0005
    quality_threshold: float = 0.95
    advisor_max_cost: int = 10
    l2_tolerance: float = 0.01


DEFAULT_CONFIG = TVDBConfig()

# The reference's integration tests run with interval 5 (bases {1, 6, 11}
# over 12 versions — tests/test_week2.py:409-434); our fixtures use the same.
FIXTURE_CONFIG = TVDBConfig(base_snapshot_interval=5)
