"""Capability-gated operators: real wiring for Spark surfaces whose
runtime dependencies this execution container lacks. Nothing here is
a declared query; the shipped engine package (operators/, plans/,
sources/, streaming/) contains only runnable functions."""
