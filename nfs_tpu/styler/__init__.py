"""Stylization engines (reference: ``styler.py`` grid/TNST and
``styler_p.py`` particle/LNST, SURVEY.md §2)."""

from nfs_tpu.styler.octave import run_octave
from nfs_tpu.styler.grid import GridStyler
from nfs_tpu.styler.particle import ParticleStyler

__all__ = ["run_octave", "GridStyler", "ParticleStyler"]
