"""Column-expression function libraries (JVM-side, no Python UDFs) plus the
numpy-backed geometry kernels used by applyInPandas operators."""
