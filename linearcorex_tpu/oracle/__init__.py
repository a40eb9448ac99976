"""Float64 NumPy oracle — the executable specification (SURVEY.md §7.0)."""

from linearcorex_tpu.oracle.oracle import (
    OracleCorex,
    anneal_schedule,
    calculate_moments,
    pick_n_hidden_oracle,
)

__all__ = [
    "OracleCorex",
    "anneal_schedule",
    "calculate_moments",
    "pick_n_hidden_oracle",
]
