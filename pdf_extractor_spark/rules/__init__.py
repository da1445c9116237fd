"""Pure-Python rule library.

Every function here is a deterministic, side-effect-free re-expression of a
reference operator (cited file:line in each docstring). The SAME functions run
in two places:

  1. the golden oracle (single-process, generates expected outputs), and
  2. inside Arrow/pandas UDFs on executors (``operators/extract.py``),

so byte-for-byte parity between the Spark pipeline and the oracle holds by
construction — the hard part (SURVEY.md §7.8 #1, Python-vs-Java regex and
float-repr divergence) is designed out.
"""
