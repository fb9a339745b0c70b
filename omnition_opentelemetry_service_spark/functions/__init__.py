"""Column-level expression builders. JVM-side (whole-stage-codegen) first;
Arrow-vectorized pandas UDFs only where built-ins can't express the op."""
