"""Presentation-tail URL building (reference app.py:111-117, 134-153) —
driver-side pure functions, no cluster work.

Behavior parity:
- seek URLs keep the original video URL form (no watch ↔ youtu.be
  rewriting), strip any existing time parameter (t / start /
  time_continue / timestart), then append the new offset;
- youtube EMBED urls only accept integer seconds → `start=<int>`;
  everything else gets `t=<sec>s` with trailing-zero-trimmed decimals;
- keyframe paths rewrite to serving URLs for <img src>.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

YT_TIME_KEYS = {"t", "start", "time_continue", "timestart"}


def _fmt_sec(start_sec: float | int | str) -> str:
    s = str(start_sec)
    if "." in s:
        return str(float(start_sec)).rstrip("0").rstrip(".")
    return s


def build_seek_url(video_url: str, start_sec: float | None = None) -> tuple[str, str | None]:
    """Attach a seek offset to a video URL, replacing stale time params."""
    base = str(video_url)
    if start_sec is None:
        return base, None
    s_str = _fmt_sec(start_sec)
    scheme, netloc, path, query, frag = urlsplit(base)
    q = [(k, v) for (k, v) in parse_qsl(query, keep_blank_values=True) if k not in YT_TIME_KEYS]
    if "youtube.com/embed" in base.lower():
        q.append(("start", str(int(float(s_str)))))
    else:
        q.append(("t", f"{s_str}s"))
    return urlunsplit((scheme, netloc, path, urlencode(q, doseq=True), frag)), s_str


def keyframe_url(image_path: str, base_url: str = "/media") -> str:
    """Rewrite a stored keyframe path to a serving URL
    (postprocess_result_urls analogue): keep the collection/video/file
    tail, root it under the media endpoint."""
    parts = [p for p in str(image_path).replace("\\", "/").split("/") if p]
    tail = parts[-3:] if len(parts) >= 3 else parts
    return base_url.rstrip("/") + "/" + "/".join(tail)
