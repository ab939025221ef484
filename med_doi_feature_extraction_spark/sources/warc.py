"""WARC (ISO 28500) container source/sink — Common Crawl's native format.

The reference ingests operational CSVs of records (reference
``src/services/input_handler.py:32-75``); at web scale the same pages
arrive as WARC archives — the container format Common Crawl publishes.
This module closes that ingest gap Spark-first:

* ``read_warc`` — ``spark.read.format("binaryFile")`` over ``*.warc`` /
  ``*.warc.gz`` files, then one Arrow-batched ``mapInPandas`` pass that
  splits records, parses WARC headers, and (for ``response`` records)
  peels the HTTP envelope off the payload. One file = one task: Common
  Crawl sizes WARC files ~1 GiB precisely so that per-file parallelism
  saturates a cluster (100 TB ≈ 10^5 files ≫ executor count), so no
  intra-file split is needed. Records inside a ``.warc.gz`` are
  *individually gzipped members* (the Common Crawl convention), which
  the parser consumes member-by-member with bounded memory.
* ``write_warc`` — deterministic distributed sink: rows are hashed to
  ``n_files`` groups, sorted ``(url, warc_ts)`` inside each group, and
  each group is serialized + atomically written by one
  ``applyInPandas`` task. Returns a per-file manifest (records, bytes,
  sha256) as the job's result — the same lineage-manifest shape as
  ``manifest.py``'s parquet sink, so a WARC export is resumable and
  auditable.

Byte-level format (ISO 28500 §4): a record is a header block of
``Key: Value`` lines terminated by CRLFCRLF, followed by exactly
``Content-Length`` payload bytes, followed by CRLFCRLF. ``response``
payloads carry a full HTTP response (status line, headers, CRLFCRLF,
body). Everything here is pure bytes arithmetic — no codec libraries.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import zlib
from datetime import datetime
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GZIP_MAGIC = b"\x1f\x8b"
_CRLF2 = b"\r\n\r\n"
_MARKER = "_WARC_SINK"

READ_SCHEMA = (
    "warc_file string, record_offset long, record_type string, "
    "url string, warc_ts timestamp, http_status int, "
    "content_type string, content_length long, html binary"
)

MANIFEST_SCHEMA = (
    "warc_file string, records long, bytes long, sha256 string"
)


# ---------------------------------------------------------------------------
# pure-python record building / parsing (unit-testable without Spark)
# ---------------------------------------------------------------------------

def build_record(
    url: str,
    ts: datetime,
    body: bytes,
    record_type: str = "response",
    content_type: str = "text/html; charset=utf-8",
    http_status: int = 200,
) -> bytes:
    """Serialize ONE WARC record (ISO 28500 §4 layout).

    ``response`` records wrap ``body`` in a minimal HTTP/1.1 response
    envelope (status line + Content-Type + Content-Length), matching
    how Common Crawl stores fetched pages; other types carry ``body``
    verbatim. Deterministic: no uuids, no wall clock — the record id
    is a content hash, so identical inputs give identical bytes."""
    if record_type == "response":
        http = (
            f"HTTP/1.1 {http_status} OK\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("ascii") + body
    else:
        http = body
    date = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    rec_id = hashlib.sha256(
        url.encode("utf-8") + date.encode("ascii") + body
    ).hexdigest()[:32]
    header = (
        "WARC/1.0\r\n"
        f"WARC-Type: {record_type}\r\n"
        f"WARC-Record-ID: <urn:sha256:{rec_id}>\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("utf-8")
    return header + http + _CRLF2


def _gunzip_members(blob: bytes) -> Iterator[bytes]:
    """Yield each gzip member of a multi-member stream (the Common
    Crawl per-record-gzip convention) with bounded state: one member
    is decompressed at a time, never the whole file."""
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        yield d.decompress(blob[pos:])
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:  # corrupt trailer — stop rather than loop
            break
        pos += consumed


def parse_warc_bytes(
    blob: bytes,
    types: tuple[str, ...] = ("response",),
) -> Iterator[dict]:
    """Iterate records in a (possibly multi-member-gzip) WARC blob.

    Splits strictly by ``Content-Length`` — never by scanning the
    payload for delimiters, so binary bodies containing ``WARC/1.0``
    or CRLFCRLF parse correctly. Records whose ``WARC-Type`` is not in
    ``types`` are skipped (warcinfo/request/metadata preambles).
    Yields dicts matching ``READ_SCHEMA`` minus ``warc_file``."""
    if blob[:2] == GZIP_MAGIC:
        chunks: Iterable[bytes] = _gunzip_members(blob)
    else:
        chunks = (blob,)
    offset = 0
    for chunk in chunks:
        pos = 0
        while pos < len(chunk):
            # tolerate inter-record padding
            while chunk[pos : pos + 2] == b"\r\n":
                pos += 2
            if pos >= len(chunk):
                break
            hdr_end = chunk.find(_CRLF2, pos)
            if hdr_end < 0:
                break
            headers: dict[str, str] = {}
            lines = chunk[pos:hdr_end].split(b"\r\n")
            if not lines[0].startswith(b"WARC/"):
                break  # not a record boundary — corrupt; stop cleanly
            for line in lines[1:]:
                k, _, v = line.partition(b":")
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("utf-8", "replace")
                )
            clen = int(headers.get("content-length", "0"))
            payload = chunk[hdr_end + 4 : hdr_end + 4 + clen]
            rec_offset = offset + pos
            pos = hdr_end + 4 + clen
            rtype = headers.get("warc-type", "")
            if rtype in types:
                status = None
                ctype = None
                body = payload
                if rtype == "response" and payload[:5] == b"HTTP/":
                    he = payload.find(_CRLF2)
                    if he >= 0:
                        hlines = payload[:he].split(b"\r\n")
                        first = hlines[0].split(b" ")
                        if len(first) >= 2 and first[1].isdigit():
                            status = int(first[1])
                        for hl in hlines[1:]:
                            hk, _, hv = hl.partition(b":")
                            if hk.strip().lower() == b"content-type":
                                ctype = hv.strip().decode("latin-1")
                        body = payload[he + 4 :]
                ts = None
                if "warc-date" in headers:
                    ts = datetime.strptime(
                        headers["warc-date"], "%Y-%m-%dT%H:%M:%SZ"
                    )
                yield {
                    "record_offset": rec_offset,
                    "record_type": rtype,
                    "url": headers.get("warc-target-uri"),
                    "warc_ts": ts,
                    "http_status": status,
                    "content_type": ctype,
                    "content_length": clen,
                    "html": body,
                }
        offset += len(chunk)


# ---------------------------------------------------------------------------
# Spark source / sink
# ---------------------------------------------------------------------------

def read_warc(
    spark: SparkSession,
    path: str,
    types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """Scan WARC files into pages rows (``READ_SCHEMA``).

    ``binaryFile`` gives (path, content) per file; a single
    ``mapInPandas`` pass parses each file's records. Column pruning
    still applies downstream (the parser emits all columns, Spark
    prunes after); the scan itself is one-file-one-row by design —
    see the module docstring for why that is the right granularity
    for WARC. ``recursiveFileLookup`` keeps partition-dir layouts
    readable."""
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .option("recursiveFileLookup", True)
        .load(path)
        .select("path", "content")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                rows = list(parse_warc_bytes(bytes(blob), types=types))
                if not rows:
                    continue
                out = pd.DataFrame(rows)
                out.insert(0, "warc_file", os.path.basename(fpath))
                out["warc_ts"] = pd.to_datetime(out["warc_ts"])
                out["http_status"] = out["http_status"].astype("Int32")
                yield out

    return files.mapInPandas(gen, schema=READ_SCHEMA)


def write_warc(
    df: DataFrame,
    out_dir: str,
    n_files: int = 8,
    compress: bool = True,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    body_col: str = "html",
) -> DataFrame:
    """Distributed deterministic WARC export; returns the manifest.

    Rows hash to ``n_files`` groups on ``xxhash64(url)`` (all
    snapshots of a url land in one file, sorted by ``(url, ts)`` —
    deterministic bytes independent of input partitioning). Each
    group is ONE ``applyInPandas`` task that serializes and atomically
    writes its file (tmp + rename). ``compress=True`` gzips each
    record as its own member (the Common Crawl layout), keeping the
    output record-seekable.

    Safety (r3 ADVICE shape): refuses to write into an existing
    non-empty ``out_dir`` unless it carries this sink's ``_WARC_SINK``
    marker — it only ever overwrites its own previous output. The
    manifest is the action's result; nothing else is collected."""
    os.makedirs(out_dir, exist_ok=True)
    existing = [f for f in os.listdir(out_dir) if not f.startswith("_")]
    if existing and not os.path.exists(os.path.join(out_dir, _MARKER)):
        raise ValueError(
            f"refusing to overwrite non-empty dir without {_MARKER}: {out_dir}"
        )
    for f in existing:
        os.unlink(os.path.join(out_dir, f))

    import pandas as pd

    def _write_group(key, pdf):
        fid = int(key[0])
        pdf = pdf.sort_values([url_col, ts_col], kind="mergesort")
        parts = []
        for url, ts, body in zip(pdf[url_col], pdf[ts_col], pdf[body_col]):
            rec = build_record(url, ts.to_pydatetime(), bytes(body))
            if compress:
                buf = io.BytesIO()
                # mtime=0 + fixed filename -> reproducible gzip bytes
                with gzip.GzipFile(
                    filename="", mode="wb", fileobj=buf, mtime=0
                ) as gz:
                    gz.write(rec)
                rec = buf.getvalue()
            parts.append(rec)
        blob = b"".join(parts)
        name = f"part-{fid:05d}.warc" + (".gz" if compress else "")
        final = os.path.join(out_dir, name)
        tmp = final + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, final)
        return pd.DataFrame(
            [
                {
                    "warc_file": name,
                    "records": len(parts),
                    "bytes": len(blob),
                    "sha256": hashlib.sha256(blob).hexdigest(),
                }
            ]
        )

    manifest = (
        df.select(url_col, ts_col, body_col)
        .withColumn("_fid", F.pmod(F.xxhash64(url_col), F.lit(n_files)))
        .groupBy("_fid")
        .applyInPandas(_write_group, schema=MANIFEST_SCHEMA)
    )
    # one action drives every file write; manifest returns to caller
    rows = manifest.collect()
    with open(os.path.join(out_dir, _MARKER), "w") as fh:
        fh.write(
            "\n".join(
                f"{r['warc_file']}\t{r['records']}\t{r['bytes']}\t{r['sha256']}"
                for r in sorted(rows, key=lambda r: r["warc_file"])
            )
        )
    import pandas as pd

    spark = df.sparkSession
    return spark.createDataFrame(
        pd.DataFrame([r.asDict() for r in rows]), schema=MANIFEST_SCHEMA
    )
