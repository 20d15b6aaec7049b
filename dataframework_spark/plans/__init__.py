"""Physical-plan introspection (pushdown / join-strategy assertions)."""
