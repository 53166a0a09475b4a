"""Deterministic synthetic creator-workflow event generator.

Reimplements the *capability* of data_generator/generator.py (417 LoC pure
Python in the reference): seeded persona-driven publishing-lifecycle events
emitted as hive-partitioned NDJSON (out/events/p_event_date=YYYY-MM-DD/
events.ndjson, generator.py:395-411). The reference's tuning profile
(profiles.yml) is gitignored, so concrete weights here are our own; the
event shape follows contracts/event_schema.json and FIXTURES.md A1.

This is a fresh implementation: story lifecycles are generated as explicit
state walks (draft → chapters → revisions → beta/submission/edit →
publish → reader decay) rather than any particular sampling scheme.
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import dataclass, field
from datetime import date, datetime, timedelta

from creatorops_lakehouse_spark.schemas import STAGE_BY_EVENT_TYPE

ISO = "%Y-%m-%dT%H:%M:%SZ"


@dataclass(frozen=True)
class Persona:
    name: str
    chapters: tuple[int, int]  # min/max chapters per story
    revisions_per_chapter: tuple[int, int]
    reader_events_per_day: tuple[int, int]
    dropoff_prob: float
    words: tuple[int, int]


PERSONAS: tuple[Persona, ...] = (
    Persona("prolific", (4, 9), (0, 2), (3, 8), 0.15, (700, 2600)),
    Persona("steady", (2, 5), (1, 3), (1, 4), 0.25, (400, 1800)),
    Persona("sporadic", (1, 3), (0, 4), (0, 2), 0.40, (150, 1200)),
)


@dataclass
class GeneratorConfig:
    seed: int = 22
    n_tenants: int = 3
    authors_per_tenant: int = 4
    stories_per_author: int = 2
    start_date: date = field(default_factory=lambda: date(2026, 4, 1))
    days: int = 14
    target_total_events: int | None = None  # downsample cap, like the reference


def _event(
    rng: random.Random,
    seq: int,
    event_type: str,
    occurred: datetime,
    tenant: str,
    author: str,
    plan: str,
    series: str,
    story: str,
    persona: str,
    chapter: str | None = None,
    scene: str | None = None,
    metrics: dict | None = None,
) -> dict:
    ev = {
        "eventId": f"evt_{seq:08d}_{rng.randrange(16**6):06x}",
        "eventType": event_type,
        "eventVersion": 1,
        "occurredAt": occurred.strftime(ISO),
        "stage": STAGE_BY_EVENT_TYPE[event_type],
        "tenant": {"tenantId": tenant, "authorId": author, "plan": plan},
        "entity": {"seriesId": series, "storyId": story},
        "producer": {
            "service": "creatorops-sim",
            "env": "dev",
            "region": "local",
            "traceId": f"t-{seq:08d}",
        },
        "metadata": {"persona": persona},
    }
    if chapter:
        ev["entity"]["chapterId"] = chapter
    if scene:
        ev["entity"]["sceneId"] = scene
    if metrics:
        ev["metrics"] = metrics
    return ev


def generate_events(cfg: GeneratorConfig) -> list[dict]:
    """Deterministic event corpus for the configured world."""
    rng = random.Random(cfg.seed)
    events: list[dict] = []
    seq = 0

    def emit(**kw) -> None:
        nonlocal seq
        seq += 1
        events.append(_event(rng, seq, **kw))

    day0 = datetime(cfg.start_date.year, cfg.start_date.month, cfg.start_date.day, 6, 0, 0)
    horizon = day0 + timedelta(days=cfg.days)

    for t in range(1, cfg.n_tenants + 1):
        tenant = f"tnt_{t:03d}"
        for a in range(1, cfg.authors_per_tenant + 1):
            author = f"auth_{t:03d}_{a:03d}"
            plan = "pro" if rng.random() < 0.4 else "free"
            persona = PERSONAS[rng.randrange(len(PERSONAS))]
            series = f"ser_{t:03d}_{a:03d}"
            for s in range(1, cfg.stories_per_author + 1):
                story = f"sto_{t:03d}_{a:03d}_{s:02d}"
                ctx = dict(
                    tenant=tenant, author=author, plan=plan,
                    series=series, story=story, persona=persona.name,
                )
                cursor = day0 + timedelta(
                    days=rng.uniform(0, max(cfg.days - 7, 1)),
                    minutes=rng.randrange(600),
                )
                emit(event_type="draft_created", occurred=cursor, **ctx)
                n_chapters = rng.randint(*persona.chapters)
                for c in range(1, n_chapters + 1):
                    cursor += timedelta(hours=rng.uniform(2, 30))
                    chapter = f"ch_{c:02d}"
                    emit(
                        event_type="chapter_written", occurred=cursor, chapter=chapter,
                        metrics={"wordCount": rng.randint(*persona.words)}, **ctx,
                    )
                    for r in range(rng.randint(*persona.revisions_per_chapter)):
                        cursor += timedelta(hours=rng.uniform(1, 10))
                        emit(
                            event_type="scene_revised", occurred=cursor,
                            chapter=chapter, scene=f"sc_{r + 1:02d}",
                            metrics={
                                "wordCount": rng.randint(50, 900),
                                "revisionCount": rng.randint(1, 5),
                            },
                            **ctx,
                        )
                # editorial phase
                for et in ("beta_feedback_received", "submission_sent", "editor_comment"):
                    if rng.random() < 0.7:
                        cursor += timedelta(hours=rng.uniform(4, 48))
                        emit(event_type=et, occurred=cursor, **ctx)
                cursor += timedelta(hours=rng.uniform(4, 24))
                emit(event_type="publish_scheduled", occurred=cursor, **ctx)
                cursor += timedelta(hours=rng.uniform(6, 48))
                emit(event_type="publish_released", occurred=cursor, **ctx)
                # reader decay window after release
                day = cursor
                while day < horizon:
                    day += timedelta(days=1)
                    age = (day - cursor).days
                    decay = max(0.15, 1.0 - 0.12 * age)
                    for _ in range(int(rng.randint(*persona.reader_events_per_day) * decay)):
                        occurred = day + timedelta(minutes=rng.randrange(14 * 60))
                        if rng.random() < persona.dropoff_prob:
                            emit(
                                event_type="reader_dropoff", occurred=occurred,
                                metrics={"engagementScore": round(rng.uniform(0, 35), 1)},
                                **ctx,
                            )
                        else:
                            emit(
                                event_type="reader_engagement", occurred=occurred,
                                metrics={"engagementScore": round(rng.uniform(5, 100), 1)},
                                **ctx,
                            )

    if cfg.target_total_events is not None and len(events) > cfg.target_total_events:
        # deterministic downsample, mirroring the reference's cap semantics
        events = rng.sample(events, cfg.target_total_events)
        events.sort(key=lambda e: (e["occurredAt"], e["eventId"]))
    return events


def write_ndjson_partitioned(events: list[dict], out_dir: str) -> list[str]:
    """Hive-partitioned NDJSON layout: out/p_event_date=YYYY-MM-DD/events.ndjson."""
    by_date: dict[str, list[dict]] = {}
    for ev in events:
        by_date.setdefault(ev["occurredAt"][:10], []).append(ev)
    paths = []
    for d, evs in sorted(by_date.items()):
        part_dir = os.path.join(out_dir, f"p_event_date={d}")
        os.makedirs(part_dir, exist_ok=True)
        path = os.path.join(part_dir, "events.ndjson")
        with open(path, "w") as fh:
            for ev in evs:
                fh.write(json.dumps(ev, separators=(",", ":")) + "\n")
        paths.append(path)
    return paths
