package graft.operators

/** DuckDB oracle for the FULL CV player-identification pipeline
  * (`cv_player_pipeline`) — the round-7 splitmix64 replay
  * ([[Multimodal.stubPixelsSqlCte]]) extended through every remaining
  * stage, so the last stub-codec query moves from rows-only to
  * hash-checked. Stage-for-stage replay of
  * `PlayerIdent.identifyPlayers` + `PlayerIdent.pipeline`:
  *
  *   1. decode      — splitmix64 pixels (shared CTE, proven by the
  *                    `mm_image_*` oracles);
  *   2. denoise     — 3×3 box mean per channel, integer division
  *                    (`Heatmaps.boxDenoise`): each pixel scatters to its
  *                    ≤9 neighbors, group by target — exact;
  *   3. stub pose   — persons = 1 + px(0)%32-free (%3), per-person
  *                    `base` from denoised pixel (0, pnum);
  *   4. posture gate— both hip angles via degrees(acos(·)) ≤ 110. The
  *                    Scala side normalizes with math.hypot, SQL with
  *                    sqrt(x²+y²); they can differ by 1 ulp, but the stub
  *                    geometry puts every angle in [78°, 90°] (seated) or
  *                    [160°, 175°] (standing) — ≥ 20° from the 110°
  *                    threshold, so no rounding can flip the gate;
  *   5. digit spot  — the three proposal boxes' blue-channel pixel sums;
  *                    pass iff sum%100 > 50; the 3-box NMS is solved in
  *                    closed form (boxes 1 and 3 overlap at IoU 40/68,
  *                    box 2 is disjoint from both), compose by x-order;
  *   6. team color  — seeded Lloyd's k-means(5), 10 unrolled rounds.
  *                    EXACT cross-engine: per-cluster channel sums are
  *                    sums of ≤324 ints ≤ 255 (integers < 2⁵³ — exact in
  *                    any order), centroids are single IEEE divisions,
  *                    distances left-associated double arithmetic
  *                    identical to the Scala loop, argmin ties break to
  *                    the smallest j exactly like the ascending scan with
  *                    strict <, and empty clusters keep their centroid
  *                    (COALESCE). Early convergence in Scala is a fixed
  *                    point, so running all 10 rounds is value-identical.
  *                    Dominant label = max count, tie → smallest label;
  *                    centroid rounds via floor(c + 0.5) = Math.round;
  *   7. team match  — L1 nearest of the two jersey anchors, first wins
  *                    ties;
  *   8. stats join  — the dimension is integer-exact arithmetic
  *                    ((id·17 % 300)/10.0 etc.), so k/10 doubles and
  *                    their string renderings agree bit-for-bit.
  *
  * Everything is MATERIALIZED: the pixel/denoise frames feed 3 consumers
  * and the k-means rounds chain 10 deep — default CTE inlining would
  * re-expand the decode exponentially (the `text_bpe_train_n5` lesson).
  */
object CvOracle {

  /** One k-means round: `a$r` assigns each crop pixel to its nearest
    * centroid of `k${r-1}` (ties → smallest j, like the Scala ascending
    * strict-< scan); `k$r` recomputes centroids as exact-integer channel
    * sums over counts, empty clusters keeping their previous value. */
  private def kmeansRoundSql(r: Int): String =
    s"""a$r AS MATERIALIZED (
       |  SELECT id, pnum, i, r, g, b, j FROM (
       |    SELECT cp.id, cp.pnum, cp.i, cp.r, cp.g, cp.b, k.j,
       |           row_number() OVER (
       |             PARTITION BY cp.id, cp.pnum, cp.i
       |             ORDER BY (CAST(cp.r AS DOUBLE) - k.cr) * (CAST(cp.r AS DOUBLE) - k.cr)
       |                    + (CAST(cp.g AS DOUBLE) - k.cg) * (CAST(cp.g AS DOUBLE) - k.cg)
       |                    + (CAST(cp.b AS DOUBLE) - k.cb) * (CAST(cp.b AS DOUBLE) - k.cb),
       |                      k.j) AS rn
       |    FROM cp JOIN k${r - 1} k USING (id, pnum)) t
       |  WHERE rn = 1),
       |k$r AS MATERIALIZED (
       |  SELECT k.id, k.pnum, k.j,
       |         coalesce(u.cr, k.cr) AS cr,
       |         coalesce(u.cg, k.cg) AS cg,
       |         coalesce(u.cb, k.cb) AS cb
       |  FROM k${r - 1} k
       |  LEFT JOIN (SELECT id, pnum, j,
       |                    CAST(sum(r) AS DOUBLE) / count(*) AS cr,
       |                    CAST(sum(g) AS DOUBLE) / count(*) AS cg,
       |                    CAST(sum(b) AS DOUBLE) / count(*) AS cb
       |             FROM a$r GROUP BY id, pnum, j) u USING (id, pnum, j))""".stripMargin

  val KmeansIters = 10

  /** The full oracle SQL (see object doc for the stage map). */
  def pipelineSql: String =
    s"""WITH ${Multimodal.stubPixelsSqlCte(1)},
       |px3 AS MATERIALIZED (
       |  SELECT id, CAST(i // 64 AS BIGINT) AS y, CAST(i % 64 AS BIGINT) AS x,
       |         CAST(px // 65536 AS BIGINT) AS r,
       |         CAST((px // 256) % 256 AS BIGINT) AS g,
       |         CAST(px % 256 AS BIGINT) AS b
       |  FROM p),
       |off AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
       |                              (1,-1),(1,0),(1,1)) v(dy, dx)),
       |dn AS MATERIALIZED (
       |  SELECT id, ny AS y, nx AS x,
       |         CAST(sum(r) // count(*) AS BIGINT) AS r,
       |         CAST(sum(g) // count(*) AS BIGINT) AS g,
       |         CAST(sum(b) // count(*) AS BIGINT) AS b
       |  FROM (SELECT id, y + dy AS ny, x + dx AS nx, r, g, b
       |        FROM px3 CROSS JOIN off) t
       |  WHERE ny BETWEEN 0 AND 63 AND nx BETWEEN 0 AND 63
       |  GROUP BY id, ny, nx),
       |np AS (SELECT id, 1 + (r * 65536 + g * 256 + b) % 3 AS np
       |       FROM dn WHERE y = 0 AND x = 0),
       |pe AS (SELECT id, unnest(range(0, np)) AS pnum FROM np),
       |pb AS MATERIALIZED (
       |  SELECT pe.id, pe.pnum,
       |         (dn.r * 65536 + dn.g * 256 + dn.b) % 32 AS base
       |  FROM pe JOIN dn ON dn.id = pe.id AND dn.y = 0 AND dn.x = pe.pnum),
       |gp AS MATERIALIZED (
       |  SELECT id, pnum, base FROM (
       |    SELECT *,
       |      degrees(acos(greatest(-1.0, least(1.0,
       |        (4.0 * kdx + (12.0 - hipy) * kdy) /
       |        (sqrt(4.0 * 4.0 + (12.0 - hipy) * (12.0 - hipy)) *
       |         sqrt(kdx * kdx + kdy * kdy)))))) AS ar,
       |      degrees(acos(greatest(-1.0, least(1.0,
       |        (8.0 * kdx + (12.0 - hipy) * kdy) /
       |        (sqrt(8.0 * 8.0 + (12.0 - hipy) * (12.0 - hipy)) *
       |         sqrt(kdx * kdx + kdy * kdy)))))) AS al
       |    FROM (SELECT id, pnum, base,
       |                 34.0 + base / 8.0 AS hipy,
       |                 CASE WHEN base % 4 = 0 THEN 0.0 ELSE 14.0 END AS kdx,
       |                 CASE WHEN base % 4 = 0 THEN 12.0 ELSE 2.0 END AS kdy
       |          FROM pb) t0) t1
       |  WHERE ar <= 110.0 AND al <= 110.0),
       |ds AS MATERIALIZED (
       |  SELECT gp.id, gp.pnum,
       |    CAST(sum(CASE WHEN dn.y >= 19 AND dn.y < 28
       |              AND dn.x >= 23 + gp.pnum AND dn.x < 29 + gp.pnum
       |             THEN dn.b ELSE 0 END) AS BIGINT) AS s1,
       |    CAST(sum(CASE WHEN dn.y >= 19 AND dn.y < 28
       |              AND dn.x >= 31 + gp.pnum AND dn.x < 37 + gp.pnum
       |             THEN dn.b ELSE 0 END) AS BIGINT) AS s2,
       |    CAST(sum(CASE WHEN dn.y >= 20 AND dn.y < 29
       |              AND dn.x >= 24 + gp.pnum AND dn.x < 30 + gp.pnum
       |             THEN dn.b ELSE 0 END) AS BIGINT) AS s3
       |  FROM gp JOIN dn ON dn.id = gp.id
       |   AND dn.y BETWEEN 19 AND 28 AND dn.x BETWEEN 23 AND 38
       |  GROUP BY gp.id, gp.pnum),
       |nm AS MATERIALIZED (
       |  SELECT id, pnum,
       |    CASE WHEN (pass1 OR pass3) AND pass2 THEN wd * 10 + d2
       |         WHEN pass1 OR pass3 THEN wd
       |         WHEN pass2 THEN d2
       |    END AS num
       |  FROM (SELECT *,
       |          CASE WHEN pass1 AND pass3 THEN
       |                 (CASE WHEN p3v > p1v THEN d3 ELSE d1 END)
       |               WHEN pass1 THEN d1 WHEN pass3 THEN d3 END AS wd
       |        FROM (SELECT id, pnum,
       |                s1 % 100 AS p1v, s2 % 100 AS p2v, s3 % 100 AS p3v,
       |                s1 % 10 AS d1, s2 % 10 AS d2, s3 % 10 AS d3,
       |                s1 % 100 > 50 AS pass1, s2 % 100 > 50 AS pass2,
       |                s3 % 100 > 50 AS pass3
       |              FROM ds) q) q2
       |  WHERE (pass1 OR pass2 OR pass3)),
       |cp AS MATERIALIZED (
       |  SELECT gp.id, gp.pnum, dn.r, dn.g, dn.b, dn.y * 64 + dn.x AS i
       |  FROM gp JOIN dn ON dn.id = gp.id
       |   AND dn.y >= 18 AND dn.y < 36
       |   AND dn.x >= 22 + gp.pnum AND dn.x < 40 + gp.pnum),
       |dis AS MATERIALIZED (
       |  SELECT id, pnum, r, g, b,
       |         row_number() OVER (PARTITION BY id, pnum ORDER BY mi) - 1 AS dj,
       |         count(*) OVER (PARTITION BY id, pnum) AS nd
       |  FROM (SELECT id, pnum, r, g, b, min(i) AS mi
       |        FROM cp GROUP BY id, pnum, r, g, b) t),
       |k0 AS MATERIALIZED (
       |  SELECT m.id, m.pnum, js.j,
       |         CAST(dis.r AS DOUBLE) AS cr, CAST(dis.g AS DOUBLE) AS cg,
       |         CAST(dis.b AS DOUBLE) AS cb
       |  FROM (SELECT DISTINCT id, pnum, nd FROM dis) m
       |  JOIN (SELECT unnest(range(0, 5)) AS j) js ON js.j < least(5, m.nd)
       |  JOIN dis ON dis.id = m.id AND dis.pnum = m.pnum
       |   AND dis.dj = (js.j * m.nd) // least(5, m.nd)),
       |${(1 to KmeansIters).map(kmeansRoundSql).mkString(",\n")},
       |dom AS (
       |  SELECT id, pnum, j FROM (
       |    SELECT id, pnum, j,
       |           row_number() OVER (PARTITION BY id, pnum
       |                              ORDER BY cnt DESC, j) AS rn
       |    FROM (SELECT id, pnum, j, count(*) AS cnt
       |          FROM a$KmeansIters GROUP BY id, pnum, j) c) t
       |  WHERE rn = 1),
       |tm AS MATERIALIZED (
       |  SELECT id, pnum,
       |         CASE WHEN abs(fr - 245) + abs(fg - 232) + abs(fb - 230)
       |                <= abs(fr - 27) + abs(fg - 48) + abs(fb - 157)
       |              THEN 'team_a' ELSE 'team_b' END AS team
       |  FROM (SELECT dom.id, dom.pnum,
       |               CAST(floor(k.cr + 0.5) AS BIGINT) AS fr,
       |               CAST(floor(k.cg + 0.5) AS BIGINT) AS fg,
       |               CAST(floor(k.cb + 0.5) AS BIGINT) AS fb
       |        FROM dom JOIN k$KmeansIters k
       |          ON k.id = dom.id AND k.pnum = dom.pnum AND k.j = dom.j) t),
       |det AS (SELECT nm.id AS doc_id, tm.team, nm.num
       |        FROM nm JOIN tm ON tm.id = nm.id AND tm.pnum = nm.pnum),
       |stats AS (SELECT t.team, CAST(v.id AS INT) AS num,
       |                 (v.id * 17 % 300) / 10.0 AS score,
       |                 (v.id * 13 % 150) / 10.0 AS reb,
       |                 (v.id * 7 % 120) / 10.0 AS ast
       |          FROM range(0, 100) v(id),
       |               (VALUES ('team_a'), ('team_b')) t(team)
       |          WHERE v.id % 3 <> 0)
       |SELECT det.doc_id, det.team, det.num, s.score, s.reb, s.ast,
       |       CASE WHEN s.score IS NULL THEN 'player not found'
       |            ELSE 'ok' END AS status,
       |       concat_ws(',', det.team, det.num, s.score, s.reb, s.ast) AS msg
       |FROM det LEFT JOIN stats s ON s.team = det.team AND s.num = det.num
       |ORDER BY det.doc_id, det.team, det.num""".stripMargin

  /** Shortest-round-trip double literal in E-notation (a bare `0.1`
    * parses as DECIMAL on both engines — decimal arithmetic would replace
    * the IEEE ops the blur replay depends on). */
  private def fmtD(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (s.contains("E")) s else s + "E0"
  }

  /** Oracle for `cv_pose_peaks` — the A5/M8 heatmap stage replayed
    * relationally: the splitmix64 stub decode's green channel over a
    * 16×16 crop is one "heatmap" channel, blurred by the REAL σ=3
    * separable gaussian (`Heatmaps.gaussianBlur`) and peak-detected by
    * the REAL 4-neighbor strict/non-strict rule with threshold 0.1
    * (`Heatmaps.detectPeaks`).
    *
    * Float replay contract: map values are FLOAT (g/255, one IEEE float
    * division); each blur pass accumulates float·kernel products in
    * DOUBLE, left-associated in kernel order — the list-comprehension
    * element is the EXPLICIT 19-term sum in the exact order of the Scala
    * while-loop, with the kernel doubles embedded as literals from the
    * shared [[graft.cv.Heatmaps.gaussKernel]] — then casts to FLOAT
    * exactly like `tmp(i) = acc.toFloat`. Identical ops on identical
    * bits on both engines, so the peak comparisons (strict < left/up,
    * non-strict right/down, edge-clamped taps) cannot diverge and the
    * raw-map `score` ships as a bit-exact FLOAT passthrough. The doc
    * subset (id % 50 = 0) bounds the replay the same way on both
    * sides. */
  def posePeaksSql: String = {
    val kernel = graft.cv.Heatmaps.gaussKernel(3.0)
    val r = kernel.length / 2
    // explicit left-assoc ordered sum over the clamped 1-based list index
    def blurSum(list: String, idx: String): String =
      (-r to r).map { k =>
        s"$list[least(greatest($idx + $k, 1), 16)] * ${fmtD(kernel(k + r))}"
      }.mkString("(", "\n         + ", ")")
    s"""WITH ${Multimodal.stubPixelsSqlCte(1)},
       |px16 AS MATERIALIZED (
       |  SELECT id, CAST(i // 64 AS BIGINT) AS y, CAST(i % 64 AS BIGINT) AS x,
       |         CAST(CAST((px // 256) % 256 AS BIGINT) AS FLOAT)
       |           / CAST(255.0 AS FLOAT) AS v
       |  FROM p WHERE id % 50 = 0 AND i % 64 < 16 AND i // 64 < 16),
       |vrow AS (SELECT id, y, list(v ORDER BY x) AS xs
       |         FROM px16 GROUP BY id, y),
       |hrow AS (SELECT id, y,
       |                [CAST(${blurSum("xs", "xi")} AS FLOAT)
       |                 for xi in range(1, 17)] AS ts
       |         FROM vrow),
       |tmp AS MATERIALIZED (
       |  SELECT id, y, unnest(range(0, 16)) AS x, unnest(ts) AS t FROM hrow),
       |tcol AS (SELECT id, x, list(t ORDER BY y) AS ys
       |         FROM tmp GROUP BY id, x),
       |vcol AS (SELECT id, x,
       |                [CAST(${blurSum("ys", "yi")} AS FLOAT)
       |                 for yi in range(1, 17)] AS ss
       |         FROM tcol),
       |sm AS MATERIALIZED (
       |  SELECT id, x, unnest(range(0, 16)) AS y, unnest(ss) AS sv FROM vcol)
       |SELECT p.id AS doc_id, CAST(p.x AS INT) AS x, CAST(p.y AS INT) AS y,
       |       raw.v AS score
       |FROM sm p
       |JOIN px16 raw ON raw.id = p.id AND raw.x = p.x AND raw.y = p.y
       |LEFT JOIN sm nl ON nl.id = p.id AND nl.y = p.y AND nl.x = p.x - 1
       |LEFT JOIN sm nr ON nr.id = p.id AND nr.y = p.y AND nr.x = p.x + 1
       |LEFT JOIN sm nu ON nu.id = p.id AND nu.x = p.x AND nu.y = p.y - 1
       |LEFT JOIN sm nd ON nd.id = p.id AND nd.x = p.x AND nd.y = p.y + 1
       |WHERE p.sv > 0.1E0
       |  AND (p.x = 0  OR p.sv > nl.sv)
       |  AND (p.x = 15 OR p.sv >= nr.sv)
       |  AND (p.y = 0  OR p.sv > nu.sv)
       |  AND (p.y = 15 OR p.sv >= nd.sv)
       |ORDER BY doc_id, y, x""".stripMargin
  }
}
