"""Solver core: annealed while_loop/scan fit program (L4)."""
