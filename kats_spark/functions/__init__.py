"""Expression-builder libraries: every function here returns pyspark Columns
(JVM-side, codegen'd) — the fast path of the engine."""
