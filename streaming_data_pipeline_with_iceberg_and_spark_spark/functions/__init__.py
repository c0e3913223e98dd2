"""Column-expression helper library (no UDFs in the hot path).

Everything here returns Spark ``Column`` objects built from built-in
functions (JVM-side, codegen-friendly) — the engine's policy is built-ins
first (SURVEY.md §2.9); Pandas UDFs appear only in ``operators.multimodal``
where byte-level decode genuinely needs Python.
"""
