"""Declarative pipeline configs → DataFrame expression DAGs."""
