"""Physical-plan inspection and assertions — the scale feedback loop."""
