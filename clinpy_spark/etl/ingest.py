"""Project-creation ETL (reference scripts/create_project.py §3.1).

Spark-first reshape (SURVEY.md §3.1): the reference's per-sample loop ->
temp table -> DISTINCT -> anti-join -> id-resolution-join dance becomes:
read all samples as one union (executors parse files in parallel),
``dropDuplicates`` on the natural key, compute the deterministic hash id
directly (no resolution join at all — the join the reference flags as
"TODO this is very slow", snp_functions.py:265, does not exist here),
and ``left_anti`` against the master only for incremental appends (J6).

Shuffle budget per modality: exactly one (the dedup); bridge writes are
shuffle-free projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clinpy_spark.functions.ids import junction_id, variant_id
from clinpy_spark.session import ProjectCatalog
from clinpy_spark.sources.rsem import read_rsem_genes, read_rsem_isoforms
from clinpy_spark.sources.star_sj import read_star_sj
from clinpy_spark.sources.vcf import (
    _SQL_TYPE,
    indexed_fields,
    normalize_type_dict,
    read_vcf,
    vcf_csq_fields,
    vcf_format_keys,
)


def _union_per_sample(parts: list[DataFrame]) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def load_samples(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Sample-metadata TSV -> samples table (create_project.py:50-66:
    lowercase headers, mandatory sample_id/cohort, projection)."""
    df = spark.read.csv(path, sep="\t", header=True, inferSchema=False)
    df = df.toDF(*[c.lower() for c in df.columns])
    for required in ("sample_id", "cohort"):
        if required not in df.columns:
            raise ValueError(f"samples file missing mandatory column {required!r}")
    if columns:
        keep = ["sample_id", "cohort"] + [
            c.lower() for c in columns if c.lower() not in ("sample_id", "cohort")
        ]
        df = df.select(*keep)
    # user_annot is a real map<string,string> (SURVEY §1.5); a TSV-borne
    # column arrives as a JSON string and is parsed into the map.
    if "user_annot" in df.columns:
        df = df.withColumn("user_annot", F.from_json("user_annot", "map<string,string>"))
    else:
        df = df.withColumn("user_annot", F.lit(None).cast("map<string,string>"))
    return df


def ingest_expression(spark: SparkSession, manifest: list[tuple[str, str]],
                      what: str = "gene") -> DataFrame:
    """(samplename, path) pairs -> one long expression table
    (create_project.py:103-141 loop -> single union job)."""
    reader = read_rsem_genes if what == "gene" else read_rsem_isoforms
    return _union_per_sample([reader(spark, p, s) for s, p in manifest])


def ingest_junctions(
    spark: SparkSession,
    catalog: ProjectCatalog,
    manifest: list[tuple[str, str]],
    min_unique_reads: int = 0,
    filtered: bool = False,
    incremental: bool = False,
    bucket_by_fk: int | None = None,
) -> None:
    """STAR SJ files -> junction master + bridge tables
    (rna_functions.py:30-104 reshaped; 'filtered' applies the QC gate
    P7 at ingest like the reference's filtered pass).

    ``bucket_by_fk=N`` writes master and bridge hash-bucketed (N
    buckets) on the join key (master.id / bridge.junction), so every
    master ⋈ bridge query runs shuffle-free — the standing co-location
    for the hottest join in the domain API. The master keeps its chrom
    directory partitions and start-sorted files either way."""
    junc_t = "junctions" if filtered else "all_junctions"
    bridge_t = "sample_to_junction" if filtered else "sample_to_alljunction"
    natural = ["chrom", "start", "end", "strand"]

    per_sample = _union_per_sample([
        read_star_sj(spark, p, s,
                     min_unique_reads=min_unique_reads if filtered else 0,
                     filter_unstranded=filtered)
        for s, p in manifest
    ])

    master_new = (
        per_sample.select(*natural).dropDuplicates(natural)  # A4
        .withColumn("id", junction_id())                      # A12: no resolution join
        .select("id", *natural)
    )
    if incremental and catalog.exists(junc_t):
        existing = catalog.table(junc_t)
        # Materialize before the append: the anti-join reads the same
        # directory the write targets.
        master_new = master_new.join(existing, natural, "left_anti").localCheckpoint(eager=True)  # J6
        mode = "append"
    else:
        mode = "overwrite"
    # Physical layout (SURVEY §1.5: partitioning replaces the reference's
    # secondary indexes, rna_tables.py:28-29): directory-partition by chrom
    # so chrom-filtered queries prune whole directories, and sort each
    # partition by start so parquet row-group min/max stats prune within.
    if bucket_by_fk:
        catalog.write_bucketed(master_new, junc_t, ["id"], bucket_by_fk,
                               sort_cols=["start"], mode=mode, partition_by=["chrom"])
    else:
        catalog.write(master_new.sortWithinPartitions("start"), junc_t, mode=mode,
                      partition_by=["chrom"])

    bridge = per_sample.select(
        "samplename", junction_id().alias("junction"), "uniq_map", "multi_map"
    )
    if incremental and catalog.exists(bridge_t):
        # Composite-PK guard (rna_tables.py:26-31): already-loaded
        # (samplename, junction) pairs are skipped, not doubled — a
        # re-ingested sample contributes only its genuinely new rows.
        loaded = catalog.table(bridge_t).select("samplename", "junction")
        bridge = bridge.join(loaded, ["samplename", "junction"], "left_anti").localCheckpoint(eager=True)
    bridge_mode = "append" if incremental else "overwrite"
    if bucket_by_fk:
        catalog.write_bucketed(bridge, bridge_t, ["junction"], bucket_by_fk,
                               sort_cols=["junction"], mode=bridge_mode)
    else:
        catalog.write(bridge, bridge_t, mode=bridge_mode)


def reconcile_fields(per_file: list[list[str]], not_same: str = "error") -> list[str]:
    """Reconcile per-file header field lists (reference
    ``compare_fields``, snp_functions.py:11-52; vcf.yaml:6 ``not_same``):
    ``error`` raises unless identical, ``union``/``intersection`` merge —
    first-file order preserved, union appends new fields in file order.
    """
    if not per_file:
        return []
    distinct = {tuple(f) for f in per_file}
    if len(distinct) == 1:
        return list(per_file[0])
    if not_same == "error":
        raise ValueError("the descriptions of fields or formats are not the same in all files")
    if not_same == "union":
        out = list(per_file[0])
        for fields in per_file[1:]:
            out.extend(f for f in fields if f not in out)
        return out
    if not_same == "intersection":
        common = set(per_file[0]).intersection(*map(set, per_file[1:]))
        return [f for f in per_file[0] if f in common]
    raise NotImplementedError("not_same field can only be 'error', 'union' or 'intersection'")


def ingest_variants(
    spark: SparkSession,
    catalog: ProjectCatalog,
    manifest: list[tuple[str, str]],
    rna: bool = False,
    filtered: bool = False,
    incremental: bool = False,
    not_same: str = "error",
    missing_impact: str = "ignore",
    type_dict: dict | None = None,
    pass_only: bool = False,
    min_qual: float | None = None,
    split_multiallelic: bool = False,
    bucket_by_fk: int | None = None,
) -> None:
    """VCFs -> variants master + impacts + sample_variants mapping
    (snp_functions.py:189-295 reshaped: CSQ explode at parse, hash
    variant ids, anti-join only for incremental; fixes the broken
    `is None` anti-join and the double-impacts join, SURVEY.md §8).

    ``not_same`` reconciles CSQ/FORMAT header sets across files
    (vcf.yaml:6, error|union|intersection); ``missing_impact``
    (vcf.yaml:9, ignore|error) governs per-file header fields outside
    the reconciled set — union-mode gaps null-fill. ``type_dict``
    (vcf.yaml ``variant_impacts``) types the impact columns.
    ``pass_only``/``min_qual`` are the QC gate for the ``filtered_``
    table families (reference feeds pre-filtered VCFs; here the gate is
    explicit, mirroring the junctions' min_unique_reads pass).

    ``bucket_by_fk=N`` hash-buckets master, mapping AND impacts on
    ``variant_id`` (N buckets): the whole J3 chain
    (variants ⋈ impacts ⋈ mapping) then joins shuffle-free.
    """
    prefix = ("filtered_" if filtered else "") + ("rna_" if rna else "")
    var_t, imp_t, map_t = f"{prefix}variants", f"{prefix}variant_impacts", f"{prefix}sample_variants"
    natural = ["chrom", "pos", "ref", "alt"]
    types = normalize_type_dict(type_dict)
    if missing_impact not in ("ignore", "error"):
        raise ValueError("missing_impact must be 'ignore' or 'error'")

    # Header reconciliation driver-side (S6, snp_functions.py:11-52).
    per_file_csq = [vcf_csq_fields(p) for _, p in manifest]
    csq_fields = reconcile_fields(per_file_csq, not_same)
    format_keys = reconcile_fields([vcf_format_keys(p) for _, p in manifest], not_same)
    if missing_impact == "error":
        for (_, p), fields in zip(manifest, per_file_csq):
            extra = [f for f in fields if f not in csq_fields]
            if extra:
                raise ValueError(f"{extra} is not defined in the vcf config ({p})")
    # Output impact columns: reconciled order, restricted to the config
    # when typed (reference coerce drops unconfigured fields).
    out_csq = [f for f in csq_fields if types is None or f in types]

    def _one_file(s: str, p: str) -> DataFrame:
        # Parse with the FILE'S OWN header order (CSQ split is positional),
        # then align to the reconciled set: union-mode gaps become typed
        # NULL columns (the reference's pandas concat null-fill).
        own = per_file_csq[[q for _, q in manifest].index(p)]
        own_kept = [f for f in own if f in csq_fields]
        df = read_vcf(spark, p, s, csq_fields=own, format_keys=format_keys,
                      type_dict=types, split_multiallelic=split_multiallelic)
        extra = [f for f in own if f not in csq_fields and (types is None or f in types)]
        if extra:
            df = df.drop(*extra)
        for f in out_csq:
            if f not in own_kept:
                sql_t = _SQL_TYPE[types[f]] if types else "string"
                df = df.withColumn(f, F.lit(None).cast(sql_t))
        return df

    parsed = _union_per_sample([_one_file(s, p) for s, p in manifest])
    if pass_only:
        parsed = parsed.filter(F.col("filter") == "PASS")
    if min_qual is not None:
        parsed = parsed.filter(F.col("qual") >= F.lit(float(min_qual)))

    master_new = (
        parsed.select("chrom", "pos", "id", "ref", "alt").dropDuplicates(natural)
        .withColumn("variant_id", variant_id())
        .select("variant_id", "chrom", "pos", "id", "ref", "alt")
    )
    if incremental and catalog.exists(var_t):
        master_new = master_new.join(
            catalog.table(var_t), natural, "left_anti"
        ).localCheckpoint(eager=True)
        mode = "append"
    else:
        mode = "overwrite"
    # Same layout story as junctions: chrom directory partitions (replaces
    # the chrom/pos indexes of snp_tables.py:8-9,17-18) + pos-sorted row
    # groups for min/max pruning on region queries (P6).
    if bucket_by_fk:
        catalog.write_bucketed(master_new, var_t, ["variant_id"], bucket_by_fk,
                               sort_cols=["pos"], mode=mode, partition_by=["chrom"])
    else:
        catalog.write(master_new.sortWithinPartitions("pos"), var_t, mode=mode,
                      partition_by=["chrom"])

    with_id = parsed.withColumn("variant_id", variant_id())
    gt_cols = ["gt_alleles", "gt_phased"] if "gt" in format_keys else []
    mapping = with_id.select(
        "variant_id", "samplename", "qual", "filter", *format_keys, *gt_cols
    ).dropDuplicates(["variant_id", "samplename"])
    if incremental and catalog.exists(map_t):
        # Composite-PK guard (snp_functions.py:171-186): already-loaded
        # (variant_id, samplename) pairs are skipped.
        loaded = catalog.table(map_t).select("variant_id", "samplename")
        mapping = mapping.join(loaded, ["variant_id", "samplename"], "left_anti").localCheckpoint(eager=True)
    map_mode = "append" if incremental else "overwrite"
    if bucket_by_fk:
        catalog.write_bucketed(mapping, map_t, ["variant_id"], bucket_by_fk,
                               sort_cols=["variant_id"], mode=map_mode)
    else:
        catalog.write(mapping, map_t, mode=map_mode)

    if out_csq:
        # Impacts carry chrom as a LAYOUT column (functionally dependent
        # on variant_id): chrom directory partitions + a sort-on-write by
        # the config's index-flagged fields give impact scans the same
        # pruning story as the master — the Spark analogue of the
        # reference's per-field `index:` flags (vcf.yaml:14-44), which it
        # turns into SQLite secondary indexes on variant_impacts.
        sort_cols = [f for f in indexed_fields(type_dict) if f in out_csq]
        if "chrom" in out_csq or "variant_id" in out_csq:
            # chrom is the impacts table's layout column and variant_id
            # its fk; a vcf.yaml CSQ field of either name (lowercased by
            # normalize_type_dict) would silently collide with them.
            raise ValueError(
                "vcf.yaml CSQ fields may not be named 'chrom' or "
                "'variant_id' (reserved by the impacts table layout) — "
                "rename the field in the config"
            )
        impacts = with_id.select("variant_id", "chrom", *out_csq).dropDuplicates()
        if incremental and catalog.exists(imp_t):
            # Anti-join guard mirroring the mapping table's: impacts of
            # already-loaded variants are skipped, not doubled — without
            # this every incremental run re-appends impact rows for every
            # parsed variant and select(impacts=True) joins fan out.
            loaded = catalog.table(imp_t).select("variant_id").distinct()
            impacts = impacts.join(loaded, "variant_id", "left_anti").localCheckpoint(eager=True)
        imp_mode = "append" if incremental else "overwrite"
        if bucket_by_fk:
            catalog.write_bucketed(impacts, imp_t, ["variant_id"], bucket_by_fk,
                                   sort_cols=sort_cols or ["variant_id"],
                                   mode=imp_mode, partition_by=["chrom"])
        elif sort_cols:
            catalog.write(impacts.sortWithinPartitions(*sort_cols), imp_t,
                          mode=imp_mode, partition_by=["chrom"])
        else:
            catalog.write(impacts, imp_t, mode=imp_mode, partition_by=["chrom"])


def create_project(spark: SparkSession, project_dir: str, config: dict | str) -> ProjectCatalog:
    """Build a project directory of Parquet tables from a config dict or a
    YAML file path (reference `create_project.py -y config.yaml`,
    create_project.py:18-303).

    config keys:
      samples: path to sample-metadata TSV (mandatory)
      rna:  {expression: [(sample, genes_path, isoforms_path)],
             junctions: [(sample, sj_path)], min_unique_reads: int}
      snps: {variants|rna_variants|filtered_variants|filtered_rna_variants:
               [(sample, vcf_path)],
             filter: {pass_only: bool, min_qual: float},   # derive filtered_*
             vcf: {not_same, missing_impact, variant_impacts}}  # vcf.yaml
      layout: {bucket_by_fk: int}  # hash-bucket masters/bridges/impacts
               on the join key (N buckets) so fk joins run shuffle-free
      incremental: bool (reference `create: false`)

    Incremental runs re-apply the reference's primary-key duplicate
    guards (samples PK readme.md:47-49; expression PK (samplename, gene)
    rna_tables.py:42-48) as anti-joins: already-loaded samples and
    already-loaded expression samplenames are skipped, not duplicated.
    """
    if isinstance(config, str):
        import yaml

        with open(config) as fh:
            config = yaml.safe_load(fh)
    catalog = ProjectCatalog(spark, project_dir)
    incremental = bool(config.get("incremental"))
    bucket_by_fk = (config.get("layout") or {}).get("bucket_by_fk")
    bucket_by_fk = int(bucket_by_fk) if bucket_by_fk else None

    samples = load_samples(spark, config["samples"], config.get("sample_columns"))
    if incremental and catalog.exists("samples"):
        samples = samples.join(
            catalog.table("samples").select("sample_id"), "sample_id", "left_anti"
        ).localCheckpoint(eager=True)
    catalog.write(samples, "samples", mode="append" if incremental else "overwrite")

    def _new_expression(df: DataFrame, table: str) -> DataFrame:
        if incremental and catalog.exists(table):
            key = ["samplename", "gene" if table == "gene_expression" else "transcript"]
            loaded = catalog.table(table).select(*key)
            return df.join(loaded, key, "left_anti").localCheckpoint(eager=True)
        return df

    rna = config.get("rna") or {}
    if rna.get("expression"):
        genes = [(s, g) for s, g, _ in rna["expression"]]
        isos = [(s, i) for s, _, i in rna["expression"] if i]
        catalog.write(_new_expression(ingest_expression(spark, genes, "gene"), "gene_expression"),
                      "gene_expression",
                      mode="append" if incremental else "overwrite")
        if isos:
            catalog.write(
                _new_expression(ingest_expression(spark, isos, "transcript"),
                                "transcript_expression"),
                "transcript_expression",
                mode="append" if incremental else "overwrite")
    if rna.get("junctions"):
        # unfiltered pass + QC-filtered pass (create_project.py:119-155)
        ingest_junctions(spark, catalog, rna["junctions"], incremental=incremental,
                         bucket_by_fk=bucket_by_fk)
        ingest_junctions(spark, catalog, rna["junctions"],
                         min_unique_reads=int(rna.get("min_unique_reads", 3)),
                         filtered=True, incremental=incremental,
                         bucket_by_fk=bucket_by_fk)

    snps = (config.get("snps") or {})
    # vcf.yaml-equivalent knobs (reference vcf.yaml:1-9 + variant_impacts):
    vcf_params = snps.get("vcf") or {}
    vcf_kw = dict(
        not_same=vcf_params.get("not_same", "error"),
        missing_impact=vcf_params.get("missing_impact", "ignore"),
        type_dict=vcf_params.get("variant_impacts"),
        split_multiallelic=bool(vcf_params.get("split_multiallelic", False)),
    )
    gate = snps.get("filter") or {}
    gate_kw = dict(
        pass_only=bool(gate.get("pass_only", True)),
        min_qual=gate.get("min_qual"),
    )
    # The four table families of reference create_project.py:101-115,
    # 153-175 + config.yaml:50-57: {,rna_}variants x {,filtered_}. A
    # filtered family either gets its own pre-filtered file list (the
    # reference's shape) or derives from the unfiltered list with the
    # explicit FILTER/qual gate when ``snps.filter`` is configured.
    for key, rna in (("variants", False), ("rna_variants", True)):
        files = snps.get(key)
        if files:
            ingest_variants(spark, catalog, files, rna=rna,
                            incremental=incremental, bucket_by_fk=bucket_by_fk,
                            **vcf_kw)
        filt_files = snps.get(f"filtered_{key}")
        if filt_files:
            ingest_variants(spark, catalog, filt_files, rna=rna, filtered=True,
                            incremental=incremental, bucket_by_fk=bucket_by_fk,
                            **vcf_kw)
        elif files and gate:
            ingest_variants(spark, catalog, files, rna=rna, filtered=True,
                            incremental=incremental, bucket_by_fk=bucket_by_fk,
                            **vcf_kw, **gate_kw)

    return catalog
