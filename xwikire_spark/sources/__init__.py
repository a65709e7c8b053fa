"""Sources & sinks for the formats the reference consumes/emits
(SURVEY §2.1: S6-S11)."""
