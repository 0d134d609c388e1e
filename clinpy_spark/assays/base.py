"""Shared assay base (reference assay_base.py:5-18, bugs fixed per
SURVEY.md §8: the session/metadata actually bind to the project).

An assay holds two catalogs: the project (Parquet dir) and optionally a
genome annotation catalog (the reference's external pytxdb engine,
readme.md:53-68). Everything is lazy — construction touches no data,
matching the reference's reflect-once design.
"""

from __future__ import annotations

from clinpy_spark.session import ProjectCatalog


class Assay:
    def __init__(self, project: ProjectCatalog, genome: ProjectCatalog | None = None):
        self.db = project
        self.genome = genome
        self.spark = project.spark
