"""Stub — filled in as operators are implemented."""
QUERIES = {}
ORACLE = {}
