"""GrAF standoff-XML corpus: deterministic synthesis + distributed parse.

The reference's PANACEA chain (SURVEY T7) reads 4-file GrAF standoff
sets per document — ``X-seg.xml`` (regions: char anchors), ``X-sent.xml``
(sentence annotations), ``X-pos.xml`` (token annotations with word/
sentOrd features), ``X-ner.xml`` (NER annotations with label/conf) —
and merges them by anchor containment
(/root/reference/transner/transner/tools/panacea_tools/preprocessing_dataset/graf_merger.py:19-121).
The real PANACEA XMLs are unreachable from this sandbox, so this module
synthesizes a byte-deterministic stand-in from the driver-provided
``documents`` table:

- one 4-file XML set per sampled document (doc_id % 7 == 0); tokens are
  the document's words laid out with single-space separators, sentences
  tile the first 4-8-word groups (trailing words stay OUTSIDE any
  sentence, exercising the reference's "Nosent?" token drop);
- NER spans cover 1-3 tokens inside sentences with a hash-derived
  conf in [0.50, 0.99] (≈half fall below the 0.75 threshold); some
  sentences get a second NER nested inside the first (exercising the
  reference's per-match multi-emission quirk); all NER starts are
  distinct per doc, so the emission order (sort by start) is total;
- structured noise the parser must skip: an unused region, a sentence
  annotation with label != 's', and a NER annotation whose node has no
  link (the reference assigns NERs inside the link loop).

Two INDEPENDENT renderings are written: the XML files (parsed back by
the Spark reader below — the production path) and element-level parquet
twins (graf_regions/sents/pos/ners — read by the DuckDB oracle), so the
gate cross-checks the whole parse+merge chain.

Scale design: the parse is mapInPandas over ``binaryFile`` rows — one
task per XML-file batch, embarrassingly parallel over documents; the
XML payload is opaque bytes to Spark (same pattern as the multimodal
decode operators).
"""

from __future__ import annotations

import hashlib
import os
import xml.etree.ElementTree as ET
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

GRAF_NS = "http://www.xces.org/ns/GrAF/1.0/"
XML_NS = "http://www.w3.org/XML/1998/namespace"
NAMESPACES = {"graph": GRAF_NS, "xml": XML_NS}

GRAF_SAMPLE_MOD = 7  # keep doc_id % 7 == 0
MAX_WORDS = 60
NER_TYPES = ("PER", "LOC", "ORG")

REGIONS_SCHEMA = "doc_id long, region_id string, start long, end long"
SENTS_SCHEMA = "doc_id long, seq long, label string, ref string, region_id string"
POS_SCHEMA = (
    "doc_id long, seq long, ref string, region_id string, "
    "word string, sent_ord string"
)
NERS_SCHEMA = (
    "doc_id long, seq long, ref string, region_id string, "
    "label string, conf string"
)


def _h(key: str) -> int:
    return int(hashlib.md5(key.encode("utf-8")).hexdigest()[:8], 16)


def synthesize_doc(doc_id: int, text: str) -> dict:
    """One document's element model: regions + sent/pos/ner annotation
    lists (document order). This model is the single source both
    renderings derive from."""
    words = [w for w in (text or "").split() if w][:MAX_WORDS]
    offs = []
    pos = 0
    for w in words:
        offs.append((pos, pos + len(w)))
        pos += len(w) + 1

    regions: list[tuple[str, int, int]] = []
    sents: list[dict] = []
    toks: list[dict] = []
    ners: list[dict] = []

    def add_region(start: int, end: int) -> str:
        rid = f"r{len(regions)}"
        regions.append((rid, start, end))
        return rid

    # sentences tile 4-8-word groups; the trailing partial group is NOT
    # covered by any sentence region (its tokens later drop as "Nosent?")
    i, s_idx = 0, 0
    sent_spans: list[tuple[int, int]] = []
    while True:
        n = 4 + _h(f"graf_slen:{doc_id}:{s_idx}") % 5
        if i + n > len(words):
            break
        sent_spans.append((i, i + n))
        i += n
        s_idx += 1

    for s_idx, (i0, i1) in enumerate(sent_spans):
        rid = add_region(offs[i0][0], offs[i1 - 1][1])
        sents.append({"label": "s", "ref": f"sn{s_idx}", "region_id": rid})

    # every token gets its own region + pos annotation; sentOrd restarts
    # per sentence, orphan tokens count from 0 too
    span_of = {}
    for s_idx, (i0, i1) in enumerate(sent_spans):
        for k in range(i0, i1):
            span_of[k] = (s_idx, k - i0)
    for k, w in enumerate(words):
        rid = add_region(*offs[k])
        _, ord_in_sent = span_of.get(k, (None, k))
        toks.append(
            {
                "ref": f"tn{k}",
                "region_id": rid,
                "word": w,
                "sentOrd": str(ord_in_sent),
            }
        )

    # NERs: hash-chosen spans inside sentences; distinct starts per doc
    n_idx = 0
    for s_idx, (i0, i1) in enumerate(sent_spans):
        h = _h(f"graf_ner:{doc_id}:{s_idx}")
        if h % 10 >= 6:
            continue
        a = i0 + h % max(1, (i1 - i0) - 1)
        b = min(i1, a + 1 + (h // 16) % 3)
        rid = add_region(offs[a][0], offs[b - 1][1])
        conf = f"{0.5 + (_h(f'graf_conf:{doc_id}:{s_idx}') % 50) / 100.0:.2f}"
        label = NER_TYPES[h % len(NER_TYPES)]
        ners.append(
            {"ref": f"nn{n_idx}", "region_id": rid, "label": label, "conf": conf}
        )
        n_idx += 1
        # nested second NER (distinct start) → multi-emission when both
        # pass the conf threshold
        if h % 10 < 2 and b - a >= 2:
            rid2 = add_region(offs[a + 1][0], offs[b - 1][1])
            conf2 = f"{0.5 + (_h(f'graf_conf2:{doc_id}:{s_idx}') % 50) / 100.0:.2f}"
            ners.append(
                {
                    "ref": f"nn{n_idx}",
                    "region_id": rid2,
                    "label": NER_TYPES[(h + 1) % len(NER_TYPES)],
                    "conf": conf2,
                }
            )
            n_idx += 1

    # parser-noise: an unused region, a non-'s' sentence annotation, a
    # linkless NER annotation
    add_region(0, 0)
    if sent_spans:
        sents.append({"label": "chunk", "ref": "snx", "region_id": None})
    ners.append({"ref": f"nn{n_idx}", "region_id": None, "label": "MISC", "conf": "0.99"})

    return {"regions": regions, "sents": sents, "toks": toks, "ners": ners}


# ------------------------------------------------------------- XML render
def _graph_root() -> ET.Element:
    return ET.Element(f"{{{GRAF_NS}}}graph")


def _render_seg(model: dict) -> bytes:
    root = _graph_root()
    for rid, start, end in model["regions"]:
        ET.SubElement(
            root,
            f"{{{GRAF_NS}}}region",
            {f"{{{XML_NS}}}id": rid, "anchors": f"{start} {end}"},
        )
    return ET.tostring(root, encoding="utf-8", xml_declaration=True)


def _render_annos(annos: list[dict], features: tuple[str, ...]) -> bytes:
    """Nodes (with link targets) + a-elements (with fs/f features), the
    4-file GrAF shape the reference parser walks."""
    root = _graph_root()
    for a in annos:
        node = ET.SubElement(
            root, f"{{{GRAF_NS}}}node", {f"{{{XML_NS}}}id": a["ref"]}
        )
        if a.get("region_id") is not None:
            ET.SubElement(node, f"{{{GRAF_NS}}}link", {"targets": a["region_id"]})
    for a in annos:
        attrs = {"ref": a["ref"]}
        if "label" in a:
            attrs["label"] = a["label"]
        a_ele = ET.SubElement(root, f"{{{GRAF_NS}}}a", attrs)
        fs = ET.SubElement(a_ele, f"{{{GRAF_NS}}}fs")
        for name in features:
            if name in a:
                ET.SubElement(
                    fs, f"{{{GRAF_NS}}}f", {"name": name, "value": str(a[name])}
                )
    return ET.tostring(root, encoding="utf-8", xml_declaration=True)


def graf_paths(repo_root: str, sf: str) -> str:
    return os.path.join(repo_root, "data", "cache", sf, "graf")


def ensure_graf_raw(repo_root: str, sf_dir: str) -> str:
    """Generate-once GrAF XML directory + element parquet twins.
    Returns the XML directory; twins land next to it as
    graf_{regions,sents,pos,ners}.parquet. tmp + os.replace per file;
    the sentinel twin (graf_regions.parquet) is written LAST so a
    mid-write crash can't satisfy the existence check."""
    import pyarrow as pa
    import pyarrow.parquet as pq_mod

    from transner_spark.sources.transcripts import sf_name

    sf = sf_name(sf_dir)
    out_dir = graf_paths(repo_root, sf)
    sentinel = out_dir + "_regions.parquet"
    if os.path.isdir(out_dir) and os.path.exists(sentinel):
        return out_dir

    docs = pq_mod.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    rows = sorted(
        zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist())
    )

    os.makedirs(out_dir, exist_ok=True)
    regions_rows, sents_rows, pos_rows, ners_rows = [], [], [], []
    for doc_id, text in rows:
        doc_id = int(doc_id)
        if doc_id % GRAF_SAMPLE_MOD != 0:
            continue
        model = synthesize_doc(doc_id, text or "")
        base = os.path.join(out_dir, f"{doc_id:06d}")
        for suffix, payload in (
            ("-seg.xml", _render_seg(model)),
            ("-sent.xml", _render_annos(model["sents"], ())),
            ("-pos.xml", _render_annos(model["toks"], ("word", "sentOrd"))),
            ("-ner.xml", _render_annos(model["ners"], ("conf",))),
        ):
            tmp = base + suffix + ".tmp"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, base + suffix)
        for rid, start, end in model["regions"]:
            regions_rows.append((doc_id, rid, start, end))
        for seq, a in enumerate(model["sents"]):
            sents_rows.append(
                (doc_id, seq, a.get("label"), a["ref"], a.get("region_id"))
            )
        for seq, a in enumerate(model["toks"]):
            pos_rows.append(
                (doc_id, seq, a["ref"], a.get("region_id"), a["word"], a["sentOrd"])
            )
        for seq, a in enumerate(model["ners"]):
            ners_rows.append(
                (doc_id, seq, a["ref"], a.get("region_id"), a["label"], a["conf"])
            )

    def write_twin(name: str, cols: dict) -> None:
        path = out_dir + f"_{name}.parquet"
        tmp = path + ".tmp"
        pq_mod.write_table(pa.table(cols), tmp)
        os.replace(tmp, path)

    write_twin(
        "sents",
        {
            "doc_id": pa.array([r[0] for r in sents_rows], pa.int64()),
            "seq": pa.array([r[1] for r in sents_rows], pa.int64()),
            "label": pa.array([r[2] for r in sents_rows], pa.string()),
            "ref": pa.array([r[3] for r in sents_rows], pa.string()),
            "region_id": pa.array([r[4] for r in sents_rows], pa.string()),
        },
    )
    write_twin(
        "pos",
        {
            "doc_id": pa.array([r[0] for r in pos_rows], pa.int64()),
            "seq": pa.array([r[1] for r in pos_rows], pa.int64()),
            "ref": pa.array([r[2] for r in pos_rows], pa.string()),
            "region_id": pa.array([r[3] for r in pos_rows], pa.string()),
            "word": pa.array([r[4] for r in pos_rows], pa.string()),
            "sent_ord": pa.array([r[5] for r in pos_rows], pa.string()),
        },
    )
    write_twin(
        "ners",
        {
            "doc_id": pa.array([r[0] for r in ners_rows], pa.int64()),
            "seq": pa.array([r[1] for r in ners_rows], pa.int64()),
            "ref": pa.array([r[2] for r in ners_rows], pa.string()),
            "region_id": pa.array([r[3] for r in ners_rows], pa.string()),
            "label": pa.array([r[4] for r in ners_rows], pa.string()),
            "conf": pa.array([r[5] for r in ners_rows], pa.string()),
        },
    )
    write_twin(
        "regions",
        {
            "doc_id": pa.array([r[0] for r in regions_rows], pa.int64()),
            "region_id": pa.array([r[1] for r in regions_rows], pa.string()),
            "start": pa.array([r[2] for r in regions_rows], pa.int64()),
            "end": pa.array([r[3] for r in regions_rows], pa.int64()),
        },
    )
    return out_dir


def graf_twin_path(repo_root: str, sf: str, name: str) -> str:
    return graf_paths(repo_root, sf) + f"_{name}.parquet"


# --------------------------------------------------------- Spark parsers
def _doc_id_of(path: str) -> int:
    return int(os.path.basename(path).split("-")[0])


def _parse_anno_tree(data: bytes) -> list[dict]:
    """a-elements in document order, each resolved through its node's
    links (LAST link wins — graf_merger keeps overwriting inside the
    link loop) and fs/f features."""
    root = ET.fromstring(data)
    # FIRST node per xml:id wins — the reference resolves refs with
    # ET.find('.//graph:node[@xml:id=...]'), which returns the first
    # match even when duplicate ids exist
    nodes: dict[str, ET.Element] = {}
    for n in root.findall(f"{{{GRAF_NS}}}node"):
        nodes.setdefault(n.attrib[f"{{{XML_NS}}}id"], n)
    out = []
    for seq, a in enumerate(root.findall(f"{{{GRAF_NS}}}a")):
        ref = a.attrib["ref"]
        region_id = None
        node = nodes.get(ref)
        if node is not None:
            for link in node:
                region_id = link.attrib["targets"]
        row = {
            "seq": seq,
            "ref": ref,
            "region_id": region_id,
            "label": a.attrib.get("label"),
        }
        for fs in a:
            for f_ele in fs:
                row[f_ele.attrib["name"]] = f_ele.attrib["value"]
        out.append(row)
    return out


def _xml_files(spark: SparkSession, graf_dir: str, suffix: str) -> DataFrame:
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"*{suffix}")
        .load(graf_dir)
        .select("path", "content")
    )


def read_graf_regions(spark: SparkSession, graf_dir: str) -> DataFrame:
    def parse(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                doc_id = _doc_id_of(path)
                root = ET.fromstring(bytes(content))
                for region in root.findall(f"{{{GRAF_NS}}}region"):
                    anchors = region.attrib["anchors"].split()
                    rows.append(
                        (
                            doc_id,
                            region.attrib[f"{{{XML_NS}}}id"],
                            int(anchors[0]),
                            int(anchors[1]),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "region_id", "start", "end"]
            )

    return _xml_files(spark, graf_dir, "-seg.xml").mapInPandas(
        parse, REGIONS_SCHEMA
    )


def _read_annos(
    spark: SparkSession, graf_dir: str, suffix: str, schema: str, fields: tuple
) -> DataFrame:
    def parse(batches) -> Iterator:
        import pandas as pd

        cols = ["doc_id", "seq"] + list(fields)
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                doc_id = _doc_id_of(path)
                for a in _parse_anno_tree(bytes(content)):
                    rows.append(
                        tuple([doc_id, a["seq"]] + [a.get(f) for f in fields])
                    )
            yield pd.DataFrame(rows, columns=cols)

    return _xml_files(spark, graf_dir, suffix).mapInPandas(parse, schema)


def read_graf_sents(spark: SparkSession, graf_dir: str) -> DataFrame:
    return _read_annos(
        spark, graf_dir, "-sent.xml", SENTS_SCHEMA, ("label", "ref", "region_id")
    )


def read_graf_pos(spark: SparkSession, graf_dir: str) -> DataFrame:
    df = _read_annos(
        spark, graf_dir, "-pos.xml", POS_SCHEMA.replace("sent_ord", "sentOrd"),
        ("ref", "region_id", "word", "sentOrd"),
    )
    return df.withColumnRenamed("sentOrd", "sent_ord")


def read_graf_ners(spark: SparkSession, graf_dir: str) -> DataFrame:
    return _read_annos(
        spark, graf_dir, "-ner.xml", NERS_SCHEMA,
        ("ref", "region_id", "label", "conf"),
    )
