"""Logical-plan helpers: filters, pagination."""
