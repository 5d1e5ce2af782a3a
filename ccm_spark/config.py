"""CCM analysis configuration — operators V1/C1/C2 of SURVEY.md §2.

Parity targets (reference = sragli/ccm, Elixir):
  - V1 equal-length validation      -> reference lib/ccm.ex:22-24
  - C1 defaults E=3, tau=1, S=100,
    max_lib_size = N - (E-1)*tau    -> reference lib/ccm.ex:26-42
  - C2 library-size ladder          -> reference lib/ccm.ex:86-97

The rebuild adds a ``seed``: the reference samples with an unseeded RNG
(lib/ccm.ex:117), which is not oracle-checkable; here every stochastic choice
is a pure function of (seed, direction, lib_size, sample_id, row index).
"""

from __future__ import annotations

from dataclasses import dataclass


def generate_lib_sizes(max_lib_size: int) -> list[int]:
    """The reference's library-size ladder (C2, lib/ccm.ex:86-97).

    max < 10          -> [max]
    otherwise         -> arithmetic sequence starting at max(max//10, 5),
                         step max(2, max//20), while <= max.
    """
    if max_lib_size < 10:
        return [max_lib_size]
    start = max(max_lib_size // 10, 5)
    step = max(2, max_lib_size // 20)
    return list(range(start, max_lib_size + 1, step))


@dataclass
class CCMConfig:
    """Analysis parameters (C1). ``lib_sizes=None`` auto-generates the ladder
    from ``max_lib_size = n_points - (embedding_dim - 1) * tau``.

    ``exclusion_radius`` (rEDM's Theiler window; NOT in the reference,
    which always uses 0): library points within ``exclusion_radius`` time
    steps of the query point are excluded from its nearest-neighbour set,
    so autocorrelation cannot inflate cross-map skill via trivially-close
    temporal neighbours. 0 (the default) reproduces the reference
    bit-for-bit; a query left with no admissible neighbours predicts 0.0
    (the engine's uniform degenerate-guard convention)."""

    embedding_dim: int = 3
    tau: int = 1
    num_samples: int = 100
    lib_sizes: list[int] | None = None
    seed: int = 42
    exclusion_radius: int = 0

    def __post_init__(self) -> None:
        if self.exclusion_radius < 0:
            raise ValueError(
                f"exclusion_radius must be >= 0 (got {self.exclusion_radius})"
            )

    def resolved_lib_sizes(self, n_points: int) -> list[int]:
        if self.lib_sizes is not None:
            return list(self.lib_sizes)
        max_lib_size = n_points - (self.embedding_dim - 1) * self.tau
        return generate_lib_sizes(max_lib_size)

    def validate_series(self, x_len: int, y_len: int) -> None:
        """V1: the reference raises on unequal-length series (lib/ccm.ex:22-24)."""
        if x_len != y_len:
            raise ValueError(
                f"x and y series must have the same length (got {x_len} and {y_len})"
            )
