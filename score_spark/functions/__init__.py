"""Reusable column-expression builders (all JVM-side, whole-stage-codegen
friendly — no Python UDFs in any hot path)."""
