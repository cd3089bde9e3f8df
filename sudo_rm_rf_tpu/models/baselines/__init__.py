"""Baseline separation models for benchmark parity (SURVEY.md section 2.2)."""
