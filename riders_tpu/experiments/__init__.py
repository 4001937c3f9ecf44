"""Experimental opt-in kernels with documented negative results.

Nothing in this package is on a production path: each module here was
built, parity-tested, measured against the XLA formulation on the real
chip, and defaulted OFF because it did not win (see PERF.md for the
per-experiment A/B numbers and the trace-level explanations).  They are
kept importable for future rounds of kernel work, explicitly — via a
constructor argument or a direct call — never via environment variables.
"""
