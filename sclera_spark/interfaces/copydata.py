"""Decoders for the pg COPY wire payload (the FROM STDIN half —
server.py spools CopyData bytes to a file and iterates rows here).

Formats exactly as PostgreSQL documents them publicly:

- TEXT (default): one row per newline; fields tab-separated; ``\\N``
  (unescaped) is NULL; backslash escapes \\b \\f \\n \\r \\t \\v \\\\,
  octal ``\\ooo`` and hex ``\\xHH`` decode to the escaped byte. Data
  never contains a raw tab/newline/backslash (the writer escapes them),
  so splitting on raw separators BEFORE unescaping is lossless.
- CSV: RFC-ish quoting with ``"`` (doubled inside quotes), embedded
  newlines legal inside quotes; an UNQUOTED empty field is NULL while
  a QUOTED empty string is '' — exactly pg's distinction, so COPY TO
  STDOUT piped back through COPY FROM STDIN is lossless in BOTH
  formats.

A trailing ``\\.`` end-of-data line (legacy v2 marker psql still
emits for file-sourced \\copy) terminates either format. Everything
streams — rows generate from bounded chunks, never the whole spool in
memory."""

from __future__ import annotations

_TEXT_ESCAPES = {
    "b": "\b",
    "f": "\f",
    "n": "\n",
    "r": "\r",
    "t": "\t",
    "v": "\v",
    "\\": "\\",
}


def _unescape_text(field: str) -> str | None:
    if field == r"\N":
        return None
    if "\\" not in field:
        return field
    out = []
    i = 0
    n = len(field)
    while i < n:
        ch = field[i]
        if ch != "\\":
            out.append(ch)
            i += 1
            continue
        i += 1
        if i >= n:
            out.append("\\")
            break
        esc = field[i]
        if esc in _TEXT_ESCAPES:
            out.append(_TEXT_ESCAPES[esc])
            i += 1
        elif esc == "x" and i + 1 < n and field[i + 1] in "0123456789abcdefABCDEF":
            j = i + 1
            hexs = field[j : j + 2]
            if len(hexs) == 2 and hexs[1] not in "0123456789abcdefABCDEF":
                hexs = hexs[:1]
            out.append(chr(int(hexs, 16)))
            i = j + len(hexs)
        elif esc in "01234567":
            j = i
            while j < n and j < i + 3 and field[j] in "01234567":
                j += 1
            out.append(chr(int(field[i:j], 8)))
            i = j
        else:
            # pg: a backslash before any other char is that char
            out.append(esc)
            i += 1
    return "".join(out)


def _iter_text_rows(path: str):
    with open(path, "r", encoding="utf-8", newline="\n") as fh:
        for line in fh:
            line = line[:-1] if line.endswith("\n") else line
            if line == r"\.":
                return
            if line == "" and False:  # pragma: no cover - explicitness
                continue
            yield [_unescape_text(f) for f in line.split("\t")]


def _iter_csv_rows(path: str):
    """Streaming pg-CSV parser: quote-aware (embedded separators and
    newlines), doubled-quote escape, unquoted empty field = NULL."""
    with open(path, "r", encoding="utf-8", newline="") as fh:
        row: list = []
        field: list[str] = []
        quoted = False  # current field was opened with a quote
        in_quotes = False
        saw_any = False  # row has content (distinguish trailing \n)

        def end_field():
            nonlocal field, quoted
            text = "".join(field)
            # pg CSV: only an UNQUOTED empty field is NULL; a quoted
            # "" is the empty string — keeping the distinction makes
            # COPY TO STDOUT → COPY FROM STDIN lossless for ''
            row.append(None if (not quoted and text == "") else text)
            field = []
            quoted = False

        while True:
            chunk = fh.read(65536)
            if not chunk:
                break
            i = 0
            n = len(chunk)
            while i < n:
                ch = chunk[i]
                if in_quotes:
                    if ch == '"':
                        # peek for a doubled quote, possibly across the
                        # chunk boundary
                        if i + 1 < n:
                            if chunk[i + 1] == '"':
                                field.append('"')
                                i += 2
                                continue
                            in_quotes = False
                            i += 1
                            continue
                        nxt = fh.read(1)
                        if nxt == '"':
                            field.append('"')
                        else:
                            in_quotes = False
                            chunk += nxt  # reprocess the peeked char
                            n = len(chunk)
                        i += 1
                        continue
                    field.append(ch)
                    i += 1
                    continue
                if ch == '"' and not field:
                    quoted = True
                    in_quotes = True
                    saw_any = True
                    i += 1
                    continue
                if ch == ",":
                    end_field()
                    saw_any = True
                    i += 1
                    continue
                if ch == "\n" or ch == "\r":
                    if ch == "\r" and i + 1 < n and chunk[i + 1] == "\n":
                        i += 1
                    if saw_any or field or row:
                        end_field()
                        if row == [r"\."]:
                            return
                        yield row
                        row = []
                    saw_any = False
                    i += 1
                    continue
                field.append(ch)
                saw_any = True
                i += 1
        if saw_any or field or row:
            end_field()
            if row != [r"\."]:
                yield row


def iter_copy_rows(path: str, fmt: str, header: bool):
    """Rows (lists of str-or-None) of a spooled COPY payload."""
    it = _iter_csv_rows(path) if fmt == "csv" else _iter_text_rows(path)
    if header:
        next(it, None)
    return it
