"""Date parsing kernels (X7).

Mirrors the reference's date handling (semantics, not code):
  * parse_dates_safely -- dateutil fuzzy parse -> "%Y-%m-%dT%H:%M:%S" string,
    first parsable value wins, falsey/unparsable -> None
    (reference: search_gov_crawler/indexing/helpers.py:36-65).
  * parse_exif_date -- the PDF ``D:``-prefixed exif date format
    (reference: search_gov_crawler/indexing/parse.py:153-211): proper format
    -> datetime, malformed-numeric -> None, non-date ``D:`` string falls
    through, any other string is sanitized.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone
from typing import Any

from .textproc import sanitize_text

_DATETIME_FORMAT = "%Y-%m-%dT%H:%M:%S"

_EXIF_DATE_RE = re.compile(
    r"^(\d{4})(\d{2})(\d{2})(\d{2})?(\d{2})?(\d{2})?([+\-Z]{0,1})?(\d{2})?'?(\d{2})?'?$"
)
_EXIF_MISFORMED_RE = re.compile(r"^[0-9zZ+\-']*$")


def parse_dates_safely(*date_values: Any) -> str | None:
    """First parsable date among ``date_values`` as an ISO string, else None."""
    from dateutil import parser
    from dateutil.parser import ParserError

    for date_value in date_values:
        if date_value is None or date_value == "":
            continue
        if isinstance(date_value, datetime):
            return date_value.strftime(_DATETIME_FORMAT)
        try:
            return parser.parse(str(date_value), fuzzy=True).strftime(_DATETIME_FORMAT)
        except (ParserError, TypeError, OverflowError):
            continue
    return None


def parse_exif_date(value: Any, *, apply_tz_offset: bool = False) -> Any:
    """Parse a PDF/exif ``D:YYYYMMDDHHmmSS[+-Z]HH'mm'`` value.

    Returns a datetime on success; None for malformed numeric strings; the
    original value for non-strings; a sanitized string otherwise — matching
    the reference's branch structure exactly (parse.py:153-211)."""
    if not isinstance(value, str):
        return value

    if value.startswith("D:"):
        date_string = value.removeprefix("D:")
        proper = _EXIF_DATE_RE.match(date_string)
        if proper:
            year, month, day = int(proper.group(1)), int(proper.group(2)), int(proper.group(3))
            hour = int(proper.group(4)) if proper.group(4) else 0
            minute = int(proper.group(5)) if proper.group(5) else 0
            second = int(proper.group(6)) if proper.group(6) else 0
            tz_sign = proper.group(7) or "Z"
            tz_hour = int(proper.group(8)) if proper.group(8) else 0
            tz_minute = int(proper.group(9)) if proper.group(9) else 0
            if proper.group(7) and apply_tz_offset:
                multiplier = -1 if tz_sign == "-" else 1
                tz = timezone(offset=timedelta(hours=tz_hour, minutes=tz_minute) * multiplier)
            else:
                tz = None
            try:
                return datetime(year, month, day, hour, minute, second, tzinfo=tz)
            except ValueError:
                return None
        if _EXIF_MISFORMED_RE.match(date_string):
            return None
        # starts with D: but probably not a date -> fall through to sanitize

    return sanitize_text(value)


def clean_pdf_metadata(meta: dict[str, Any]) -> dict[str, Any]:
    """Strip the leading '/' from PDF info keys and exif-parse each value
    (reference parse.py get_pdf_meta, :128-151)."""
    return {str(k).removeprefix("/"): parse_exif_date(v, apply_tz_offset=False) for k, v in meta.items()}
