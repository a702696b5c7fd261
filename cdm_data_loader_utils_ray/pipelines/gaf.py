"""GAF (GO Gene Association File) normalization pipeline — the reference's
``parsers/gene_association_file.py:106-222`` withColumn chain, composed as a
library operator a user can call (r1 only demonstrated the kernels in the
query catalog).

Stages, all inside ONE ``map_batches`` pass (no shuffle — the ECO mapping is
a small broadcast dict, the reference's two-level evidence join J4):

  rename/select -> derive predicate/object/publications/supporting_objects
  -> guarded to_date (8-digit yyyyMMdd else null) -> NOT| negation flag +
  strip -> predicate whitelist (invalid values RAISE, as the reference
  does) -> explode publications + drop empties + upper/trim -> ECO
  (evidence_code, publication) lookup with (evidence_code, DEFAULT)
  fallback -> final projection in the reference's column order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

GAF_COLUMNS = [
    "DB", "DB_Object_ID", "Qualifier", "GO_ID", "DB_Reference",
    "Evidence_Code", "With_From", "Date", "Assigned_By",
]

ALLOWED_PREDICATES = [
    "enables",
    "contributes_to",
    "acts_upstream_of_or_within",
    "involved_in",
    "acts_upstream_of",
    "acts_upstream_of_positive_effect",
    "acts_upstream_of_negative_effect",
    "acts_upstream_of_or_within_negative_effect",
    "acts_upstream_of_or_within_positive_effect",
    "located_in",
    "part_of",
    "is_active_in",
    "colocalizes_with",
]

FINAL_COLUMNS = [
    "object", "DB", "annotation_date", "predicate", "Evidence_Code",
    "publications", "DB_Object_ID", "primary_knowledge_source",
    "supporting_objects", "aggregator", "protocol_id", "negated",
    "subject", "evidence_type",
]

GAF_SCHEMA = pa.schema([pa.field(c, pa.string()) for c in GAF_COLUMNS])


def parse_eco_mapping(text: str) -> tuple[dict[tuple[str, str], str], dict[str, str]]:
    """Parse the public gaf-eco-mapping.txt format (tab-separated
    ``evidence_code<TAB>db_reference<TAB>ECO id``, '#' comments) into the
    exact-match map and the DEFAULT fallback map (reference
    ``load_eco_mapping`` + ``merge_evidence`` semantics, upper/trimmed)."""
    exact: dict[tuple[str, str], str] = {}
    fallback: dict[str, str] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) < 3:
            continue
        code, ref, eco = parts[0].strip().upper(), parts[1].strip().upper(), parts[2].strip()
        if ref == "DEFAULT":
            fallback[code] = eco
        else:
            exact[(code, ref)] = eco
    return exact, fallback


class GafNormalizer:
    """map_batches stage: the full normalize chain for one Arrow batch.
    The ECO maps are plain dicts held per actor (tiny broadcast)."""

    def __init__(self, eco_exact: dict, eco_fallback: dict):
        self.eco_exact = dict(eco_exact)
        self.eco_fallback = dict(eco_fallback)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return _empty_output()
        qualifier = batch["Qualifier"].combine_chunks() if isinstance(
            batch["Qualifier"], pa.ChunkedArray) else batch["Qualifier"]
        # negation flag + NOT| strip (reference process_predicates)
        negated = pc.fill_null(pc.starts_with(qualifier, "NOT|"), False)
        predicate = pc.replace_substring_regex(qualifier, r"^NOT\|", "")
        # predicate whitelist: invalid values RAISE, matching the reference
        ok = pc.fill_null(pc.is_in(predicate, value_set=pa.array(ALLOWED_PREDICATES)), False)
        if not pc.all(ok).as_py():
            bad = sorted(
                set(predicate.filter(pc.invert(ok)).to_pylist()),
                key=lambda v: (v is None, v),  # null qualifiers sort first
            )
            raise ValueError(f"Invalid predicate(s) found: {bad}")
        # guarded to_date: 8-digit yyyyMMdd else null (normalize_dates).
        # error_is_null also nulls 8-digit non-dates like '20231399' — the
        # regex alone can't prove calendar validity
        date_raw = pc.cast(batch["Date"], pa.string())
        is_date = pc.fill_null(pc.match_substring_regex(date_raw, r"^[0-9]{8}$"), False)
        safe = pc.if_else(is_date, date_raw, pa.scalar("19700101"))
        parsed = pc.cast(
            pc.strptime(safe, format="%Y%m%d", unit="us", error_is_null=True),
            pa.date32(),
        )
        annotation_date = pc.if_else(is_date, parsed, pa.nulls(n, pa.date32()))
        # publications: split(trim(coalesce(ref, ''))), then EXPLODE
        refs = pc.utf8_trim_whitespace(pc.fill_null(batch["DB_Reference"], ""))
        pubs = pc.split_pattern(refs, "|")
        lengths = pc.list_value_length(pubs).to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(n), lengths)
        flat_pubs = pc.utf8_upper(pc.utf8_trim_whitespace(pc.list_flatten(pubs)))
        keep = pc.fill_null(pc.not_equal(flat_pubs, ""), False).to_numpy(
            zero_copy_only=False
        )
        parent = parent[keep]
        flat_pubs = flat_pubs.filter(pa.array(keep))
        take = pa.array(parent)
        # ECO two-level lookup on the exploded rows
        codes = pc.utf8_upper(
            pc.utf8_trim_whitespace(pc.cast(batch["Evidence_Code"], pa.string()))
        ).take(take).to_pylist()
        pub_list = flat_pubs.to_pylist()
        exact, fb = self.eco_exact, self.eco_fallback
        evidence_type = pa.array(
            [exact.get((c, p), fb.get(c)) for c, p in zip(codes, pub_list)],
            type=pa.string(),
        )
        # supporting objects: '|' join of split(trim(with_from)); '' -> null
        supp = pc.utf8_trim_whitespace(pc.cast(batch["With_From"], pa.string()))
        supp = pc.if_else(pc.equal(supp, ""), pa.nulls(n, pa.string()), supp)
        subject = pc.binary_join_element_wise(
            pc.cast(batch["DB"], pa.string()),
            pc.cast(batch["DB_Object_ID"], pa.string()),
            ":",
        )
        neg_str = pc.if_else(negated, pa.scalar("true"), pa.scalar("false"))
        cols = {
            "object": batch["GO_ID"].take(take),
            "DB": batch["DB"].take(take),
            "annotation_date": annotation_date.take(take),
            "predicate": predicate.take(take),
            "Evidence_Code": batch["Evidence_Code"].take(take),
            "publications": flat_pubs,
            "DB_Object_ID": batch["DB_Object_ID"].take(take),
            "primary_knowledge_source": batch["Assigned_By"].take(take),
            "supporting_objects": supp.take(take),
            # explicit type: an all-empty explode would otherwise infer a
            # null-typed column and break cross-block schema unification
            "aggregator": pa.array(["UniProt"] * len(parent), type=pa.string()),
            "protocol_id": pa.nulls(len(parent), pa.string()),
            "negated": neg_str.take(take),
            "subject": subject.take(take),
            "evidence_type": evidence_type,
        }
        return pa.table({c: cols[c] for c in FINAL_COLUMNS})


def _empty_output() -> pa.Table:
    fields = []
    for c in FINAL_COLUMNS:
        fields.append(pa.field(c, pa.date32() if c == "annotation_date" else pa.string()))
    return pa.schema(fields).empty_table()


def load_gaf(paths, eco_mapping_text: str, *, delimiter: str = ",",
             header: bool = True, concurrency: int | None = None):
    """GAF CSV path(s) -> normalized annotation Dataset (reference
    association_update end-to-end: load -> normalize -> explode -> ECO
    merge -> reorder).  ``eco_mapping_text`` is the content of the public
    gaf-eco-mapping.txt (the reference downloads it; no network here)."""
    from cdm_data_loader_utils_ray.sources.dsv import read_dsv

    exact, fb = parse_eco_mapping(eco_mapping_text)
    ds = read_dsv(paths, GAF_SCHEMA, delimiter=delimiter, header=header)

    def drop_invalid(batch: pa.Table) -> pa.Table:
        # PERMISSIVE read artifacts are not GAF rows
        if "__invalid_data__" in batch.column_names:
            batch = batch.filter(pc.is_null(batch["__invalid_data__"]))
            batch = batch.drop_columns(["__invalid_data__"])
        return batch

    kwargs = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(drop_invalid, batch_format="pyarrow").map_batches(
        GafNormalizer(exact, fb), batch_format="pyarrow", **kwargs
    )


def normalize_gaf_dataset(ds, eco_mapping_text: str):
    """Same chain over an existing Dataset with GAF_COLUMNS."""
    exact, fb = parse_eco_mapping(eco_mapping_text)
    return ds.map_batches(GafNormalizer(exact, fb), batch_format="pyarrow")
