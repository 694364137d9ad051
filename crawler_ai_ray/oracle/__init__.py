"""Single-process oracle implementations used only by tests and golden
generation — independent re-implementations of the pinned semantics so
the engine's distributed output can be checked against a second code path.
"""
