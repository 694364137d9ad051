"""Pure, stateless per-record functions (no Ray imports).

These are the scalar/struct functions the Ray stages apply inside
``map_batches``; keeping them Ray-free makes them unit-testable and
shareable with the single-process conformance oracle.
"""
