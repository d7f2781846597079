"""Standalone diagnostic tools (reference: legacy/DrawKeypoints.cpp,
legacy/rotations.cpp — component L16 in SURVEY.md §2.2)."""
