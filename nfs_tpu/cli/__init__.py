"""Command-line drivers (reference: ``config.py`` argparse surface +
``main.py`` driver, SURVEY.md §2)."""
