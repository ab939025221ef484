"""Relational + temporal operators of the engine (DataFrame-first)."""
