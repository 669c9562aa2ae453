"""DuckDB oracle SQL for the KG queries.

Each oracle is a self-contained SQL string over the SAME synthetic Parquet
files the Ray pipeline reads (``synth.ensure_synth``), implementing the
pipeline spec (extraction grammar, norm_key normalization, resolution
statuses, anaphora, sameAs closure, transitive closure, first-wins dedup)
independently in SQL. The driver compares Ray output vs these row-set-wise.
"""

from __future__ import annotations

from .. import synth

_NORM = r"regexp_replace(lower(trim({x})), '^([0-9]+)\.0+$', '\1')"

_MENTION_PAT = r"\[\[([^\]]+)\]\]"
_REL_PAT = (r"\[\[([^\]]+)\]\] (includes|depends on|is replaced by|"
            r"documents|aka) \[\[([^\]]+)\]\]")


def _prefix(sf_dir: str) -> str:
    p = synth.ensure_synth(sf_dir)
    norm_alias = _NORM.format(x="m.alias")
    norm_a = _NORM.format(x="r.a")
    norm_b = _NORM.format(x="r.b")
    return f"""
WITH RECURSIVE
turns AS (SELECT * FROM read_parquet('{p["turns"]}')),
ents AS (SELECT * FROM read_parquet('{p["entities"]}')),
m_raw AS (
  SELECT conv_id, turn_idx,
         unnest(l) AS alias,
         CAST(unnest(range(len(l))) AS INTEGER) AS ord
  FROM (SELECT conv_id, turn_idx,
               regexp_extract_all(text, '{_MENTION_PAT}', 1) AS l
        FROM turns)),
m_sub AS (
  SELECT conv_id, turn_idx, ord,
    CASE WHEN alias = 'that one' THEN
      coalesce(last_value(CASE WHEN alias <> 'that one' THEN alias END
                          IGNORE NULLS)
        OVER (PARTITION BY conv_id ORDER BY turn_idx, ord
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        'that one')
    ELSE alias END AS alias
  FROM m_raw),
dict AS (
  SELECT {_NORM.format(x="name")} AS nname,
         count(DISTINCT entity_id) AS n_cand,
         min(entity_id) AS only_id
  FROM ents GROUP BY 1),
idmap AS (SELECT lower(entity_id) AS nid, entity_id FROM ents),
m_res AS (
  SELECT m.conv_id, m.turn_idx, m.ord, m.alias,
         CASE WHEN d.n_cand = 1 THEN d.only_id
              WHEN d.n_cand IS NULL THEN i.entity_id END AS entity_id,
         CASE WHEN d.n_cand = 1 THEN 'resolved'
              WHEN d.n_cand > 1 THEN 'ambiguous'
              WHEN i.entity_id IS NOT NULL THEN 'resolved'
              ELSE 'unknown' END AS status
  FROM m_sub m
  LEFT JOIN dict d ON d.nname = {norm_alias}
  LEFT JOIN idmap i ON i.nid = {norm_alias}),
r_events AS (
  SELECT conv_id, turn_idx, g['a'] AS a, g['b'] AS b,
    CASE g['relword'] WHEN 'includes' THEN 'hasComponent'
         WHEN 'depends on' THEN 'dependsOn'
         WHEN 'is replaced by' THEN 'hasAlternate'
         WHEN 'documents' THEN 'describes'
         ELSE 'sameAs' END AS pred
  FROM (SELECT conv_id, turn_idx,
               regexp_extract(text, '{_REL_PAT}', ['a','relword','b']) AS g
        FROM turns
        WHERE regexp_matches(text, '{_REL_PAT}'))),
r_res AS (
  SELECT r.conv_id, r.turn_idx, r.pred,
         CASE WHEN da.n_cand = 1 THEN da.only_id
              WHEN da.n_cand IS NULL THEN ia.entity_id END AS a_id,
         CASE WHEN da.n_cand = 1 THEN 'resolved'
              WHEN da.n_cand > 1 THEN 'ambiguous'
              WHEN ia.entity_id IS NOT NULL THEN 'resolved'
              ELSE 'unknown' END AS a_status,
         CASE WHEN db.n_cand = 1 THEN db.only_id
              WHEN db.n_cand IS NULL THEN ib.entity_id END AS b_id,
         CASE WHEN db.n_cand = 1 THEN 'resolved'
              WHEN db.n_cand > 1 THEN 'ambiguous'
              WHEN ib.entity_id IS NOT NULL THEN 'resolved'
              ELSE 'unknown' END AS b_status
  FROM r_events r
  LEFT JOIN dict da ON da.nname = {norm_a}
  LEFT JOIN idmap ia ON ia.nid = {norm_a}
  LEFT JOIN dict db ON db.nname = {norm_b}
  LEFT JOIN idmap ib ON ib.nid = {norm_b}),
sa AS (
  SELECT a_id AS u, b_id AS v FROM r_res
  WHERE pred = 'sameAs' AND a_status = 'resolved' AND b_status = 'resolved'
    AND a_id <> b_id
  UNION
  SELECT b_id, a_id FROM r_res
  WHERE pred = 'sameAs' AND a_status = 'resolved' AND b_status = 'resolved'
    AND a_id <> b_id),
reach(u, v) AS (
  SELECT u, v FROM sa
  UNION
  SELECT reach.u, sa.v FROM reach JOIN sa ON reach.v = sa.u),
canon AS (
  SELECT u AS entity_id, least(u, min(v)) AS canon_id
  FROM reach GROUP BY u),
resolved_mentions AS (
  SELECT coalesce(c.canon_id, m.entity_id) AS canon_id, m.conv_id, m.turn_idx
  FROM m_res m LEFT JOIN canon c ON c.entity_id = m.entity_id
  WHERE m.status = 'resolved'),
first_mention AS (
  SELECT canon_id,
         min(conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 6, '0')) AS prov
  FROM resolved_mentions GROUP BY canon_id),
ent_attr AS (
  SELECT f.canon_id, f.prov, e.name, e.part_type, e.view, e.state,
         e.source, e.revision, e.container
  FROM first_mention f JOIN ents e ON e.entity_id = f.canon_id),
entity_triples AS (
  SELECT 'urn:entity:' || canon_id AS subj,
         'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
         'urn:ontology:Entity' AS obj, prov FROM ent_attr
  UNION ALL SELECT 'urn:entity:' || canon_id, 'urn:ontology:name',
         coalesce(name, canon_id), prov FROM ent_attr
  UNION ALL SELECT 'urn:entity:' || canon_id,
         'http://www.w3.org/2000/01/rdf-schema#label',
         coalesce(name, canon_id), prov FROM ent_attr
  UNION ALL SELECT 'urn:entity:' || canon_id, 'urn:ontology:hasPartType',
         'urn:ontology:' || part_type, prov FROM ent_attr
         WHERE part_type IS NOT NULL
  UNION ALL SELECT 'urn:entity:' || canon_id, 'urn:ontology:hasView',
         'urn:ontology:' || view, prov FROM ent_attr WHERE view IS NOT NULL
  UNION ALL SELECT 'urn:entity:' || canon_id, 'urn:ontology:hasState',
         'urn:ontology:' || state, prov FROM ent_attr WHERE state IS NOT NULL
  UNION ALL SELECT 'urn:entity:' || canon_id, 'urn:ontology:hasSource',
         'urn:ontology:' || source, prov FROM ent_attr WHERE source IS NOT NULL
  UNION ALL SELECT 'urn:entity:' || canon_id, 'urn:ontology:hasRevision',
         revision, prov FROM ent_attr WHERE revision IS NOT NULL
  UNION ALL SELECT 'urn:entity:' || canon_id, 'urn:ontology:inContainer',
         container, prov FROM ent_attr WHERE container IS NOT NULL),
rel_canon AS (
  SELECT r.pred,
         coalesce(ca.canon_id, r.a_id) AS a_c,
         coalesce(cb.canon_id, r.b_id) AS b_c,
         r.conv_id || ':' || lpad(CAST(r.turn_idx AS VARCHAR), 6, '0') AS prov
  FROM r_res r
  LEFT JOIN canon ca ON ca.entity_id = r.a_id
  LEFT JOIN canon cb ON cb.entity_id = r.b_id
  WHERE r.pred <> 'sameAs'
    AND r.a_status = 'resolved' AND r.b_status = 'resolved'),
rel_triples AS (
  SELECT 'urn:entity:' || a_c AS subj, 'urn:ontology:' || pred AS pred,
         'urn:entity:' || b_c AS obj, prov FROM rel_canon
  UNION ALL
  SELECT 'urn:entity:' || b_c, 'urn:ontology:usedIn',
         'urn:entity:' || a_c, prov FROM rel_canon
  WHERE pred = 'hasComponent'),
tool_triples AS (
  SELECT 'urn:conv:' || conv_id AS subj, 'urn:ontology:usedTool' AS pred,
         tool AS obj,
         conv_id || ':' || lpad(CAST(turn_idx AS VARCHAR), 6, '0') AS prov
  FROM turns WHERE tool IS NOT NULL),
comp AS (
  SELECT DISTINCT a_c AS parent, b_c AS child FROM rel_canon
  WHERE pred = 'hasComponent'),
paths(anc, dsc) AS (
  SELECT parent, child FROM comp
  UNION
  SELECT p.anc, c.child FROM paths p JOIN comp c ON p.dsc = c.parent),
closure_triples AS (
  SELECT 'urn:entity:' || dsc AS subj, 'urn:ontology:partOfAssembly' AS pred,
         'urn:entity:' || anc AS obj, '' AS prov FROM paths),
all_triples AS (
  SELECT subj, pred, obj FROM entity_triples
  UNION ALL SELECT subj, pred, obj FROM rel_triples
  UNION ALL SELECT subj, pred, obj FROM tool_triples
  UNION ALL SELECT subj, pred, obj FROM closure_triples)
"""


def kg_oracles(sf_dir: str) -> dict[str, str]:
    p = _prefix(sf_dir)
    paths = synth.ensure_synth(sf_dir)
    topic_pat = "(" + "|".join(synth.TOPICS) + ")$"
    return {
        "kg_mentions": p + "SELECT conv_id, turn_idx, ord, alias FROM m_sub",
        "kg_resolution_status":
            p + "SELECT status, count(*) AS n FROM m_res GROUP BY status",
        "kg_sameas_canon":
            p + ("SELECT entity_id, canon_id FROM canon "
                 "WHERE entity_id <> canon_id"),
        "kg_first_mention":
            p + "SELECT canon_id, prov FROM first_mention",
        "kg_closure":
            p + 'SELECT anc, dsc AS "desc" FROM paths',
        "kg_triples":
            p + "SELECT DISTINCT subj, pred, obj FROM all_triples",
        "kg_pred_counts":
            p + ("SELECT pred, count(*) AS n FROM "
                 "(SELECT DISTINCT subj, pred, obj FROM all_triples) "
                 "GROUP BY pred"),
        "kg_topic_turns": f"""
            SELECT regexp_extract(text, '{topic_pat}', 1) AS topic,
                   count(*) AS n
            FROM read_parquet('{paths["turns"]}')
            WHERE regexp_matches(text, '{topic_pat}')
            GROUP BY 1""",
        "kg_tool_usage": f"""
            SELECT tool, count(DISTINCT conv_id) AS n_convs
            FROM read_parquet('{paths["turns"]}')
            WHERE tool IS NOT NULL GROUP BY tool""",
        "kg_twin_pairs": f"""
            SELECT a.entity_id AS id_lo, b.entity_id AS id_hi, a.name
            FROM read_parquet('{paths["entities"]}') a
            JOIN read_parquet('{paths["entities"]}') b
              ON a.name = b.name AND a.entity_id < b.entity_id""",
        "kg_depth_topk": p + """
            , comp_walk(anc, node, depth) AS (
              SELECT parent, child, 1 FROM comp
              UNION
              SELECT w.anc, c.child, w.depth + 1
              FROM comp_walk w JOIN comp c ON w.node = c.parent
              WHERE w.depth < 4)
            SELECT anc, max(depth) AS depth FROM comp_walk GROUP BY anc
            ORDER BY depth DESC, anc LIMIT 5""",
        "kg_resolution_report": p + f"""
            SELECT {_NORM.format(x="alias")} AS nalias, status,
                   count(*) AS n
            FROM m_res WHERE status <> 'resolved'
            GROUP BY 1, 2""",
        "kg_fuzzy_candidates": p + f"""
            , unk AS (
              SELECT DISTINCT {_NORM.format(x="alias")} AS nalias
              FROM m_res WHERE status = 'unknown'),
            ut AS (SELECT nalias,
                          list_distinct(string_split(nalias, ' ')) AS toks
                   FROM unk),
            et AS (SELECT entity_id,
                          string_split({_NORM.format(x="name")}, ' ')[1]
                              AS blk,
                          list_distinct(string_split(
                              {_NORM.format(x="name")}, ' ')) AS toks
                   FROM ents),
            cand AS (
              SELECT u.nalias, e.entity_id,
                     len(list_intersect(u.toks, e.toks)) * 1.0 /
                     len(list_distinct(u.toks || e.toks)) AS score
              FROM ut u JOIN et e
                ON string_split(u.nalias, ' ')[1] = e.blk),
            mx AS (SELECT nalias, max(score) AS mx FROM cand GROUP BY nalias),
            top AS (
              SELECT c.nalias, c.entity_id, c.score
              FROM cand c JOIN mx ON mx.nalias = c.nalias
               AND c.score = mx.mx
              WHERE mx.mx >= 0.5)
            SELECT nalias, entity_id, round(score, 6) AS score FROM top
            WHERE nalias IN (SELECT nalias FROM top
                             GROUP BY nalias HAVING count(*) = 1)""",
        "kg_prefix_pairs": p + """
            , blk AS (
              SELECT entity_id,
                     string_split(name, ' ')[1] || ' ' ||
                     string_split(name, ' ')[2] AS b
              FROM ents WHERE len(string_split(name, ' ')) >= 3),
            cand AS (
              SELECT a.entity_id AS id_lo, b2.entity_id AS id_hi
              FROM blk a JOIN blk b2
                ON a.b = b2.b AND a.entity_id < b2.entity_id)
            SELECT id_lo, id_hi FROM cand p2
            WHERE NOT EXISTS (
              SELECT 1 FROM comp c
              WHERE (c.parent = p2.id_lo AND c.child = p2.id_hi)
                 OR (c.parent = p2.id_hi AND c.child = p2.id_lo))""",
    }
