"""PDF / document-text source (SURVEY.md §2A #3-4).

The reference reads one PDF on the driver with pdfplumber and joins all
page text (dask-with-dataframe-[2].py:102-104) or iterates page lines
(detail_notes.py:30-36). Spark-first shape: a binaryFile scan produces
(path, content) rows; ``pdf_pages`` explodes each document into
(doc_id, page_no, text) rows via an Arrow-batched mapInPandas — the
text-extraction library runs on executors, one task per file batch, so a
million PDFs parse in parallel.

Extraction dispatch (pdfplumber is not installable in this container —
scripts/DECODER_ATTEMPTS.md): pdfplumber when importable → a REAL
stdlib-only extractor for simple text PDFs (plain or /FlateDecode
content streams, literal/hex strings, Tj/TJ/'/" show operators with
Td/TD/T* line breaks — the shape office-suite and report generators
emit, including the reference's financial statements) → a
NotImplementedError gate for PDFs the stdlib path cannot confidently
parse (CID-keyed fonts, encrypted files), where tests fall back to
pre-extracted page fixtures (FIXTURES.md A3) through
``pages_from_rows``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "doc_id string, page_no int, text string"


def _pdf_literal(cs: bytes, i: int) -> tuple[str, int]:
    """Parse a PDF literal string starting at ``cs[i] == '('``; returns
    (text, index after closing paren). Handles nesting and the standard
    escapes incl. octal."""
    assert cs[i] == 0x28
    depth, out, i = 1, bytearray(), i + 1
    esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
           0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
    while i < len(cs) and depth:
        c = cs[i]
        if c == 0x5C and i + 1 < len(cs):
            n = cs[i + 1]
            if n in esc:
                out.append(esc[n])
                i += 2
                continue
            if 0x30 <= n <= 0x37:  # octal, up to 3 digits
                j, val = i + 1, 0
                while j < len(cs) and j <= i + 3 and 0x30 <= cs[j] <= 0x37:
                    val = val * 8 + (cs[j] - 0x30)
                    j += 1
                out.append(val & 0xFF)
                i = j
                continue
            i += 2  # line continuation / unknown escape: drop backslash
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if not depth:
                i += 1
                break
        out.append(c)
        i += 1
    return out.decode("latin-1"), i


def _text_from_content(cs: bytes) -> str:
    """Walk a (decompressed) content stream and join the text-show
    operators: (s) Tj, [ ... ] TJ, ' and ". Td/TD with a vertical move
    and T* become newlines — the standard line heuristic for generated
    report PDFs (no font metrics needed)."""
    parts: list[str] = []
    strings_since_op: list[str] = []
    last_nums: list[float] = []
    in_array = False
    i, n = 0, len(cs)

    def flush(sep: str) -> None:
        if strings_since_op:
            parts.append("".join(strings_since_op))
            strings_since_op.clear()
        if parts and sep and parts[-1] != "\n":
            parts.append(sep)

    while i < n:
        c = cs[i]
        if c == 0x28:  # literal string
            s, i = _pdf_literal(cs, i)
            strings_since_op.append(s)
            continue
        if c == 0x3C and i + 1 < n and cs[i + 1] != 0x3C:  # hex string
            j = cs.find(b">", i)
            if j == -1:
                break
            hx = bytes(cs[i + 1 : j]).replace(b" ", b"").replace(b"\n", b"")
            if len(hx) % 2:
                hx += b"0"
            strings_since_op.append(bytes.fromhex(hx.decode("ascii")).decode("latin-1"))
            i = j + 1
            continue
        if c == 0x5B:  # [ — TJ array begins
            in_array = True
            i += 1
            continue
        if c == 0x5D:
            in_array = False
            i += 1
            continue
        if c in b"-.0123456789":
            j = i
            while j < n and cs[j] in b"-.0123456789":
                j += 1
            try:
                val = float(cs[i:j])
                last_nums.append(val)
                # TJ kerning: a large negative advance between array
                # strings is how generators encode an inter-word gap
                if in_array and strings_since_op and val <= -100:
                    strings_since_op.append(" ")
            except ValueError:
                pass
            i = j
            continue
        if c in b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz'\"*":
            j = i
            while j < n and cs[j] in (
                b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz'\"*"
            ):
                j += 1
            op = bytes(cs[i:j])
            if op == b"Tj":
                flush("")
            elif op == b"TJ":
                flush("")
            elif op in (b"'", b'"'):
                parts.append("\n")
                flush("")
            elif op in (b"Td", b"TD"):
                moved_y = len(last_nums) >= 1 and last_nums[-1] != 0.0
                flush("\n" if moved_y else " ")
            elif op == b"T*":
                flush("\n")
            last_nums.clear()
            i = j
            continue
        i += 1
    flush("")
    text = "".join(parts)
    return "\n".join(seg.strip() for seg in text.split("\n")).strip()


def _extract_pages_stdlib(data: bytes) -> list[str] | None:
    """REAL stdlib-only page-text extraction for simple PDFs; None when
    the file is outside the supported subset (caller falls back)."""
    import re
    import zlib

    if not data.startswith(b"%PDF"):
        return None
    objs: dict[int, bytes] = {}
    order: list[int] = []
    for m in re.finditer(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", data, re.S):
        num = int(m.group(1))
        if num not in objs:
            order.append(num)
        objs[num] = m.group(2)

    def content_bytes(num: int) -> bytes:
        body = objs.get(num, b"")
        sm = re.search(rb"stream\r?\n(.*?)\r?\nendstream", body, re.S)
        if not sm:
            return b""
        raw = sm.group(1)
        head = body[: sm.start()]
        if b"/FlateDecode" in head:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                return b""
        return raw

    def kids_order() -> list[int] | None:
        """Page object numbers in page-tree (/Pages /Kids) order — the
        DOCUMENT order, which can differ from byte-occurrence order in
        incrementally-updated PDFs. None when no tree is parsable."""
        root = None
        for num in order:
            cm = re.search(rb"/Type\s*/Catalog\b", objs[num])
            if cm:
                pm = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", objs[num])
                if pm:
                    root = int(pm.group(1))
                break
        if root is None:  # no catalog: try a /Pages node nobody references
            nodes = [n for n in order if re.search(rb"/Type\s*/Pages\b", objs[n])]
            if len(nodes) == 1:
                root = nodes[0]
        if root is None:
            return None
        out: list[int] = []
        seen: set[int] = set()

        def walk(num: int) -> None:
            if num in seen or num not in objs or len(seen) > len(objs):
                return
            seen.add(num)
            body = objs[num]
            km = re.search(rb"/Kids\s*\[(.*?)\]", body, re.S)
            if km:
                for x in re.findall(rb"(\d+)\s+\d+\s+R", km.group(1)):
                    walk(int(x))
            elif re.search(rb"/Type\s*/Page\b", body):
                out.append(num)

        walk(root)
        return out or None

    leaf_nums = kids_order() or [
        num
        for num in order
        if re.search(rb"/Type\s*/Page\b", objs[num]) and b"/Kids" not in objs[num]
    ]
    pages: list[str] = []
    for num in leaf_nums:
        body = objs[num]
        refs = []
        cm = re.search(rb"/Contents\s*\[(.*?)\]", body, re.S)
        if cm:
            refs = [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", cm.group(1))]
        else:
            cm = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
            if cm:
                refs = [int(cm.group(1))]
        cs = b"".join(content_bytes(r) for r in refs)
        pages.append(_text_from_content(cs))
    return pages or None


def _extract_pages(content: bytes) -> list[str]:
    """Per-document page text extraction (executor-side): pdfplumber →
    stdlib extractor → explicit gate."""
    try:
        import io

        import pdfplumber

        with pdfplumber.open(io.BytesIO(content)) as pdf:
            return [page.extract_text() or "" for page in pdf.pages]
    except ImportError:
        pass
    pages = _extract_pages_stdlib(content)
    if pages is not None:
        return pages
    raise NotImplementedError(
        "this PDF is outside the stdlib extractor's subset (CID fonts, "
        "encryption, or no parsable page tree) and pdfplumber is not "
        "installed in this runtime; supply pre-extracted page text via "
        "pages_from_rows(), or install pdfplumber on executors"
    )


def pdf_pages(spark: SparkSession, path_glob: str) -> DataFrame:
    """binaryFile scan → (doc_id, page_no, text), one row per page.

    page_no is 1-based in document order (the CALK parser depends on
    line order within doc — SURVEY.md §2A #21).
    """
    binaries = (
        spark.read.format("binaryFile").option("pathGlobFilter", "*.pdf").load(path_glob)
    )

    def parse(batches):
        import pandas as pd

        for pdf_batch in batches:
            rows = []
            for _, row in pdf_batch.iterrows():
                for i, text in enumerate(_extract_pages(row["content"]), start=1):
                    rows.append({"doc_id": row["path"], "page_no": i, "text": text})
            yield pd.DataFrame(rows, columns=["doc_id", "page_no", "text"])

    return binaries.select("path", "content").mapInPandas(parse, schema=PAGES_SCHEMA)


def pages_from_rows(
    spark: SparkSession, rows: list[tuple[str, int, str]]
) -> DataFrame:
    """Build the canonical pages DataFrame from pre-extracted text —
    the test/fixture entry point with the exact schema pdf_pages emits."""
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def full_text(pages: DataFrame) -> DataFrame:
    """(doc_id, text): newline-join of all pages in order — the analog of
    the reference's ''.join(page.extract_text()) whole-document string."""
    from pyspark.sql import functions as F

    return (
        pages.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("page_no", "text"))
                    ),
                    lambda s: s["text"],
                ),
            ).alias("text")
        )
    )
