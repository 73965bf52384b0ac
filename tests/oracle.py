"""Pure-Python oracle: a direct single-process reimplementation of the
reference's analysis semantics (go-app/report/analyzeLog.go, details.go),
with SURVEY.md §5 quirk decisions Q1-Q11 applied. This is the goldens
generator — the Spark pipeline is compared against its output.

The oracle models the log per-LINE (the engine's unit of distribution); the
reference scans one joined string. For line-anchored patterns — which the
config lint requires — the two are equivalent; `go_findall` lets tests
assert that equivalence on the fixture corpus.

Ordering decisions (for reference behaviors that are Go-map nondeterministic):
  Q3 process blocks concat in process-name ascending order (analyzeLog.go:158)
  Q4 priority ties broken by issue name ascending (analyzeLog.go:108-110)
  Q5 header extra fields sorted ascending (analyzeLog.go:118-122)
  events: on multi-event collision at one line, max event name wins
          (map overwrite at details.go:177 — order undefined in Go)
"""

from __future__ import annotations

import re
from typing import Any

from radar_log_parser_spark.config import (
    LOG_LEVELS,
    ConfigSpec,
    severity_pattern,
)


def go_findall(pattern: str, content: str) -> list[str]:
    """Go regexp.FindAllString(content, -1) — full match strings.

    Compiled re.ASCII, like every pattern in this oracle: Go's regexp (RE2)
    treats \\d/\\w/\\b as ASCII-only, so a faithful Python oracle must not
    use Python's wider Unicode classes (ADVICE r3)."""
    return [m.group(0) for m in re.finditer(pattern, content, re.ASCII)]


def _line_matches(pattern: str, lines: list[str]) -> list[int]:
    """Line ordinals whose line matches `pattern` (per-line semantics)."""
    rgx = re.compile(pattern, re.ASCII)
    return [i for i, line in enumerate(lines) if rgx.search(line)]


def _field_content(field_rgx: str, content: str) -> str:
    """getFieldContent (analyzeLog.go:305-313): '<n> :  <joined>' — note the
    two spaces after the colon."""
    match = go_findall(field_rgx, content)
    return str(len(match)) + " :  " + "\n".join(match)


def analyse(lines: list[str], cfg: ConfigSpec, platform: str) -> dict[str, Any]:
    """Full AnalyseLog + events + severity for ONE log (= one `source`).

    Returns JSON-able golden dict:
      specific_issues: {process: [line_no, ...]}           (Q1 kept only)
      other_issues:    {issue: {number, match_set, rows, log_level,
                                timestamp, fields}}        rows=[proc, line_no, match]
      grouped_issues:  {issue: {names, groups: {key: [[detail...,], count]},
                                number, log_level, timestamp, fields}}
      events:          [[line_no, event], ...] ordered by line_no
      severity:        {level: [[line_no, n_matches], ...]}
      summary:         {ordered_issues, header, issues: {issue: {col: val}}}
    """
    content = "\n".join(lines)

    # ---- F1 specific-process filter + Q1 keep rule (analyzeLog.go:125-146)
    spec_proc_lines: dict[str, list[int]] = {}
    for proc in sorted(cfg.specific_process):
        matched = _line_matches(cfg.specific_process[proc], lines)
        if len(matched) > 1:  # `len(proc_content) > 1` at analyzeLog.go:137
            spec_proc_lines[proc] = matched

    # ---- F2 per-issue scoping with Q2 semantics (analyzeLog.go:156-178):
    # only processes that passed Q1 contribute; blocks ordered by process
    # name ascending (Q3). Scoped content = list of (proc, line_no) rows.
    def issue_scope(issue) -> list[tuple[str, int]]:
        rows: list[tuple[str, int]] = []
        for proc in sorted(issue.specific_process):
            for ln in spec_proc_lines.get(proc, []):
                rows.append((proc, ln))
        return rows

    issues_map: dict[str, dict[str, str]] = {}
    other_issues: dict[str, Any] = {}
    grouped_issues: dict[str, Any] = {}
    header_extras: set[str] = set(cfg.general.other_fields)

    ts_rgx = re.compile(cfg.general.timestamp, re.ASCII) if cfg.general.timestamp else None
    lvl_rgx = re.compile(cfg.general.log_level, re.ASCII) if cfg.general.log_level else None

    for iname in sorted(cfg.issues):
        issue = cfg.issues[iname]
        imap: dict[str, str] = {}
        issues_map[iname] = imap
        scope = issue_scope(issue)
        scope_texts = [lines[ln] for _, ln in scope]
        # reference builds issueContent with a trailing "\n" per block
        # (analyzeLog.go:176-177); for line-level patterns the empty lines
        # are inert, so scoped content == scope_texts joined.
        scoped_content = "\n".join(scope_texts)

        if issue.grouped:
            # ---- F4 grouped match (groupIssueDetails + fillGroupDetails,
            # analyzeLog.go:196-265)
            grgx = re.compile(issue.grouping, re.ASCII)
            names = issue.group_names()
            group_content: dict[str, list[list[str]]] = {}
            group_count: dict[str, list[int]] = {}
            last_match_line = ""
            for text in scope_texts:
                m = grgx.search(text)
                if m is None or grgx.groups < 2:  # len(matches) > 2 gate
                    continue
                last_match_line = text
                key = m.group(1) or ""
                details = [g or "" for g in m.groups()[1:]]
                if key not in group_content:
                    group_content[key] = []
                    group_count[key] = []
                for idx, tup in enumerate(group_content[key]):
                    if tup == details:
                        group_count[key][idx] += 1
                        break
                else:
                    group_content[key].append(details)
                    group_count[key].append(1)
            number = sum(n for counts in group_count.values() for n in counts)
            imap["Number"] = str(number)  # Q9: plain integer semantics
            if ts_rgx is not None:
                m = ts_rgx.search(last_match_line)
                if m:
                    imap["Timestamp"] = m.group(0)
            if lvl_rgx is not None:
                m = lvl_rgx.search(last_match_line)
                if m and m.lastindex:
                    imap["LogLevel"] = m.group(1)
            # Q10: grouped fields search the FULL scoped content
            for fname in sorted(cfg.general.other_fields):
                imap[fname] = _field_content(cfg.general.other_fields[fname], scoped_content)
            for fname in sorted(issue.additional_fields):
                imap[fname] = _field_content(issue.additional_fields[fname], scoped_content)
                header_extras.add(fname)
            grouped_issues[iname] = {
                "names": names,
                "groups": {
                    k: [[group_content[k][i], group_count[k][i]] for i in range(len(group_count[k]))]
                    for k in sorted(group_content)
                },
                "number": number,
                "log_level": imap.get("LogLevel", ""),
                "timestamp": imap.get("Timestamp", ""),
                "fields": {
                    f: imap[f]
                    for f in list(cfg.general.other_fields) + list(issue.additional_fields)
                    if f in imap
                },
            }
        else:
            # ---- F3 non-grouped match (nongroupIssueDetails,
            # analyzeLog.go:266-304). Matches per scoped row, left-to-right.
            irgx = re.compile(issue.regex, re.ASCII)
            rows: list[tuple[str, int, str]] = []  # (proc, line_no, match)
            for proc, ln in scope:
                for m in irgx.finditer(lines[ln]):
                    rows.append((proc, ln, m.group(0)))
            filter_logs = [m for _, _, m in rows]
            imap["Number"] = str(len(filter_logs))
            if filter_logs:
                if lvl_rgx is not None:
                    m = lvl_rgx.search(filter_logs[0])  # FIRST match (go:285)
                    if m and m.lastindex:
                        imap["LogLevel"] = m.group(1)
                # Q10: non-grouped fields search the JOINED MATCHES
                joined = "\n".join(filter_logs)
                for fname in sorted(cfg.general.other_fields):
                    imap[fname] = _field_content(cfg.general.other_fields[fname], joined)
                for fname in sorted(issue.additional_fields):
                    imap[fname] = _field_content(issue.additional_fields[fname], joined)
                    header_extras.add(fname)
                if ts_rgx is not None:
                    m = ts_rgx.search(filter_logs[-1])  # LAST match (go:299)
                    if m:
                        imap["Timestamp"] = m.group(0)
            other_issues[iname] = {
                "number": len(filter_logs),
                "match_set": sorted(set(filter_logs)),
                "rows": [[p, ln, m] for p, ln, m in rows],
                "log_level": imap.get("LogLevel", ""),
                "timestamp": imap.get("Timestamp", ""),
                "fields": {
                    f: imap[f]
                    for f in list(cfg.general.other_fields) + list(issue.additional_fields)
                    if f in imap
                },
            }

    # ---- F9 important events (getImportantEvents, details.go:154-186)
    # contentMap: line text → LAST index (Q7); event name collisions at one
    # line resolved by max name (sorted-asc processing order).
    content_map: dict[str, int] = {}
    for idx, line in enumerate(lines):
        content_map[line] = idx
    important: dict[int, str] = {}
    for ev in sorted(cfg.important_events):
        for match in go_findall(cfg.important_events[ev], content):
            important[content_map.get(match, 0)] = ev
    events = sorted(important.items())

    # ---- F8 severity (GetLogLeveldetails, details.go:187-194)
    severity: dict[str, list[list[int]]] = {}
    for level in LOG_LEVELS.get(platform, []):
        pat = severity_pattern(platform, level)
        rgx = re.compile(pat, re.ASCII)
        per_line = []
        for i, line in enumerate(lines):
            n = len(rgx.findall(line))
            if n:
                per_line.append([i, n])
        severity[level] = per_line

    # ---- summary ordering (sortIssue + fillHeader, analyzeLog.go:102-124)
    ordered = sorted(cfg.issues, key=lambda n: (-cfg.priority.get(n, 0), n))  # Q4
    header = ["Issue", "Number", "Details", "Timestamp", "LogLevel"] + sorted(
        header_extras
    )  # Q5

    return {
        "specific_issues": {p: spec_proc_lines[p] for p in sorted(spec_proc_lines)},
        "other_issues": other_issues,
        "grouped_issues": grouped_issues,
        "events": [[ln, ev] for ln, ev in events],
        "severity": severity,
        "summary": {
            "ordered_issues": ordered,
            "header": header,
            "issues": issues_map,
            "priority": {n: cfg.priority.get(n, 0) for n in cfg.issues},
        },
    }


def analyse_corpus(corpus: dict[str, list[str]], cfg: ConfigSpec) -> dict[str, Any]:
    """Per-source analysis: each `source` is an independent log file whose
    platform is the source value (reference: analyzeLog.go:75 sets Platform
    from the selected bucket)."""
    return {src: analyse(corpus[src], cfg, platform=src) for src in sorted(corpus)}
