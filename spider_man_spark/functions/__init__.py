"""Column-expression function library (JVM-side wherever possible)."""
