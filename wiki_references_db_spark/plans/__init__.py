"""Logical build plans: extract staging, dedup, warehouse construction."""
