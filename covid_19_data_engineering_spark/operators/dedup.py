"""Placeholder — queries register here in a later phase."""
