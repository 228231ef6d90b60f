package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.{GQuery, Tables}
import graft.engine.GQuery._

/** Graph analytics beyond components/triangles/pagerank: bipartite
  * projection, k-core peeling, and Markov-chain power iteration — all as
  * plain joins + aggregates (no GraphX), all oracle-declared.
  */
object GraphOps {

  /** Weighted BIPARTITE PROJECTION — collapse a two-mode graph
    * (supplier–brand, derived from lineitem×part) onto its SMALL side:
    * brand pairs weighted by how many distinct suppliers stock both,
    * plus the Jaccard overlap of their supplier sets. Projecting onto
    * the small side is THE scale rule for this operator: per-node
    * fan-out is bounded by |brands|² (25² here), so a supplier
    * contributes at most 300 pairs no matter how many line items it
    * has — the projection explode can never follow the fact-table
    * skew. The two-mode edge list collapses to DISTINCT first
    * (combinable, shuffle carries |suppliers|·|brands| rows max);
    * set sizes ride a window over that reduced table; the pair join
    * is a self equi-join ON SUPPLIER (the bounded side). */
  val qBipartiteProj: GQuery = GQuery(
    "q_bipartite_proj",
    (spark, dir) => {
      import spark.implicits._
      val sb = Tables.lineitem(spark, dir)
        .join(Tables.part(spark, dir),
          $"l_partkey" === $"p_partkey")
        .select($"l_suppkey".as("s"), $"p_brand".as("b"))
        .distinct()
      val sized = sb.withColumn("sz",
        count(lit(1)).over(Window.partitionBy($"b")))
      sized.as("x").join(sized.as("y"),
          col("x.s") === col("y.s") && col("x.b") < col("y.b"))
        .groupBy(col("x.b").as("brand_a"), col("y.b").as("brand_b"),
          col("x.sz").as("na"), col("y.sz").as("nb"))
        .agg(count(lit(1)).as("w"))
        .select($"brand_a", $"brand_b", $"na", $"nb", $"w",
          r6($"w".cast("double") / ($"na" + $"nb" - $"w")).as("jaccard"))
        .orderBy($"brand_a", $"brand_b")
    },
    Some(s"""
      WITH sb AS (
        SELECT DISTINCT l_suppkey AS s, p_brand AS b
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      sized AS (
        SELECT s, b,
               cast(count(*) OVER (PARTITION BY b) as bigint) AS sz
        FROM sb),
      pr AS (
        SELECT x.b AS brand_a, y.b AS brand_b, x.sz AS na, y.sz AS nb,
               count(*) AS w
        FROM sized x JOIN sized y ON x.s = y.s AND x.b < y.b
        GROUP BY 1, 2, 3, 4)
      SELECT brand_a, brand_b, na, nb, w,
             ${r6Sql("cast(w as double) / (na + nb - w)")} AS jaccard
      FROM pr ORDER BY brand_a, brand_b"""),
  )

  /** K-CORE decomposition (k = 3) by FIXED-ROUND peeling over the
    * co-purchase graph: each round computes degrees (one combinable
    * groupBy over the edge list), keeps nodes with degree >= k, and
    * restricts edges to kept endpoints (two LEFT SEMI joins). Four
    * rounds reach the fixed point on this graph at every SF — and a
    * fixed round count is computed identically by both engines, so
    * the oracle match never depends on a convergence test (the
    * q_conncomp rule). Per round the work is linear in |E|; the edge
    * list is the same small-parts co-purchase restriction as
    * q_pagerank (p_size <= 10 keeps the per-order pair explode
    * SF-linear) and each round's survivor set is localCheckpoint'd —
    * a peeled level is referenced twice (degree pass + next level),
    * and without materialization the lineage doubles per round
    * (2^rounds recomputes; the recursive-CTE lesson). The oracle
    * mirrors this with MATERIALIZED per-level CTEs. Output: the
    * 3-core members with their core degree. */
  val qKcore: GQuery = {
    val k = 3
    val rounds = 4
    GQuery(
      "q_kcore",
      (spark, dir) => {
        import spark.implicits._
        val op = Tables.lineitem(spark, dir)
          .join(Tables.part(spark, dir),
            $"l_partkey" === $"p_partkey" && $"p_size" <= 10)
          .select($"l_orderkey", $"l_partkey")
          // r15: no .distinct() before the collect_set groupBy — the set
          // agg dedups per order anyway; the distinct was a full extra
          // shuffle of the (order, part) pairs for the same ps arrays.
        val und = op.groupBy($"l_orderkey")
          .agg(sort_array(collect_set($"l_partkey")).as("ps"))
          .filter(size($"ps") >= 2)
          .select(explode(expr(
            "flatten(transform(sequence(1, size(ps)-1), i -> " +
              "transform(sequence(i+1, size(ps)), j -> " +
              "struct(element_at(ps, i) as pa, element_at(ps, j) as pb))))"))
            .as("pr"))
          .select($"pr.pa".as("pa"), $"pr.pb".as("pb"))
          .distinct()
        var e = und.select($"pa".as("src"), $"pb".as("dst"))
          .unionByName(und.select($"pb".as("src"), $"pa".as("dst")))
          .localCheckpoint()
        for (_ <- 1 to rounds) {
          val keep = e.groupBy($"src").agg(count(lit(1)).as("deg"))
            .filter($"deg" >= k).select($"src".as("v"))
          e = e.join(keep.select($"v".as("src")), "src", "left_semi")
            .join(keep.select($"v".as("dst")), "dst", "left_semi")
            .select($"src", $"dst")
            .localCheckpoint()
        }
        e.groupBy($"src".as("node"))
          .agg(count(lit(1)).cast("int").as("core_degree"))
          .orderBy($"node")
      },
      Some {
        val steps = (1 to rounds).map { i =>
          s"""k$i AS MATERIALIZED (
             |  SELECT src AS v FROM e${i - 1}
             |  GROUP BY src HAVING count(*) >= $k),
             |e$i AS MATERIALIZED (
             |  SELECT src, dst FROM e${i - 1}
             |  WHERE src IN (SELECT v FROM k$i)
             |    AND dst IN (SELECT v FROM k$i))""".stripMargin
        }.mkString(",\n")
        s"""
        WITH op AS (
          SELECT DISTINCT l_orderkey, l_partkey
          FROM lineitem JOIN part
            ON l_partkey = p_partkey AND p_size <= 10),
        pairs AS (
          SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
          FROM op a JOIN op b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        e0 AS MATERIALIZED (
          SELECT pa AS src, pb AS dst FROM pairs
          UNION ALL SELECT pb, pa FROM pairs),
        $steps
        SELECT src AS node, cast(count(*) as int) AS core_degree
        FROM e$rounds GROUP BY src ORDER BY node"""
      },
    )
  }

  /** Markov-chain POWER ITERATION over the event-type transition
    * matrix: consecutive same-user events define the 5×5 row-stochastic
    * matrix (the q_transitions extraction — lag window ordered by
    * (ts, event_id), no self-join), then four fixed v·P steps from the
    * uniform start approximate the stationary behavior mix. Matrix
    * power as relational algebra: each step is ONE equi-join of the
    * |types|-row distribution with the |types|²-row matrix and ONE
    * groupBy — the template that scales to a million-state chain
    * (shuffle on the join key, combinable sum) even though it is tiny
    * here. Cross-engine float determinism: each cell probability and
    * each product term is IEEE-rounded (rN at 12 dp) BEFORE the
    * per-step sum, and the sum accumulates in exact decimal(30,12) —
    * shuffle-order-free on any cluster (the dsum contract); the final
    * distribution rounds to 6 dp. */
  val qMarkov: GQuery = {
    val steps = 4
    GQuery(
      "q_markov",
      (spark, dir) => {
        import spark.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val m = Tables.events(spark, dir)
          .select($"user_id", $"event_type", $"ts", $"event_id")
          .withColumn("prev_type", lag($"event_type", 1).over(w))
          .filter($"prev_type".isNotNull)
          .groupBy($"prev_type".as("i"), $"event_type".as("j"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p", rN($"n".cast("double") /
            sum($"n").over(Window.partitionBy($"i")).cast("double"), 12))
          .select($"i", $"j", $"p")
          .localCheckpoint()
        var v = m.select($"i".as("state")).distinct()
          .withColumn("prob", lit(0.2))
        for (_ <- 1 to steps) {
          v = v.join(m, $"state" === $"i")
            .select($"j", rN($"prob" * $"p", 12).as("term"))
            .groupBy($"j")
            .agg(sum($"term".cast("decimal(30,12)")).cast("double")
              .as("prob"))
            .select($"j".as("state"), $"prob")
        }
        v.select($"state", r6($"prob").as("stationary_p"))
          .orderBy($"state")
      },
      Some {
        val chain = (1 to steps).map { s =>
          s"""v$s AS (
             |  SELECT j AS state,
             |         cast(sum(cast(${rNSql(s"prob * p", 12)}
             |           as decimal(30,12))) as double) AS prob
             |  FROM v${s - 1} JOIN m ON state = i
             |  GROUP BY j)""".stripMargin
        }.mkString(",\n")
        s"""
        WITH st AS (
          SELECT user_id, event_type,
                 lag(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY date_trunc('second', ts), event_id) AS prev_type
          FROM events),
        cnt AS (
          SELECT prev_type AS i, event_type AS j, count(*) AS n
          FROM st WHERE prev_type IS NOT NULL
          GROUP BY i, j),
        m AS MATERIALIZED (
          SELECT i, j, ${rNSql("cast(n as double) / cast(sum(n) OVER " +
                "(PARTITION BY i) as double)", 12)} AS p
          FROM cnt),
        v0 AS (SELECT DISTINCT i AS state, cast(0.2 as double) AS prob
               FROM m),
        $chain
        SELECT state, ${r6Sql("prob")} AS stationary_p
        FROM v$steps ORDER BY state"""
      },
    )
  }

  /** BFS HOP DISTANCES from a seed vertex by MIN-PLUS iteration — the
    * "how far does influence reach" primitive (recall radius,
    * contamination spread). Same single-reference iteration template
    * as q_conncomp: the self-loop-augmented edge list folds "keep your
    * current distance" into the one equi-join per hop
    * (dist'(dst) = min over in-edges of dist(src) + w, w = 0 on the
    * self-loop, 1 otherwise), so each level is ONE join + ONE
    * combinable min-groupBy, linear in |E| — and the oracle's chained
    * CTEs reference each level exactly once. The seed is derived
    * in-query (min vertex id — deterministic at every SF). Four hops;
    * unreached vertices simply never enter the distance table (no
    * infinity sentinel to disagree on). Output: hop histogram, the
    * |reached| per distance. */
  val qBfs: GQuery = {
    val hops = 4
    GQuery(
      "q_bfs",
      (spark, dir) => {
        import spark.implicits._
        val op = Tables.lineitem(spark, dir)
          .join(Tables.part(spark, dir),
            $"l_partkey" === $"p_partkey" && $"p_size" <= 10)
          .select($"l_orderkey", $"l_partkey")
          // r15: no .distinct() before the collect_set groupBy — the set
          // agg dedups per order anyway; the distinct was a full extra
          // shuffle of the (order, part) pairs for the same ps arrays.
        val und = op.groupBy($"l_orderkey")
          .agg(sort_array(collect_set($"l_partkey")).as("ps"))
          .filter(size($"ps") >= 2)
          .select(explode(expr(
            "flatten(transform(sequence(1, size(ps)-1), i -> " +
              "transform(sequence(i+1, size(ps)), j -> " +
              "struct(element_at(ps, i) as pa, element_at(ps, j) as pb))))"))
            .as("pr"))
          .select($"pr.pa".as("pa"), $"pr.pb".as("pb"))
          .distinct()
          .localCheckpoint()
        val vs = und.select($"pa".as("v"))
          .unionByName(und.select($"pb".as("v"))).distinct()
        val e = und.select($"pa".as("src"), $"pb".as("dst"), lit(1).as("w"))
          .unionByName(und.select($"pb".as("src"), $"pa".as("dst"),
            lit(1).as("w")))
          .unionByName(vs.select($"v".as("src"), $"v".as("dst"),
            lit(0).as("w")))
          .localCheckpoint()
        var dist = vs.agg(min($"v").as("seed"))
          .select($"seed".as("node"), lit(0).as("dist"))
        for (_ <- 1 to hops) {
          dist = e.join(dist, $"src" === $"node")
            .groupBy($"dst")
            .agg(min($"dist" + $"w").as("d2"))
            .select($"dst".as("node"), $"d2".as("dist"))
        }
        dist.groupBy($"dist".cast("int").as("hops"))
          .agg(count(lit(1)).as("n_reached"))
          .orderBy($"hops")
      },
      Some {
        val steps = (1 to hops).map { k =>
          s"""d$k AS (
             |  SELECT e.dst AS node, min(dp.dist + e.w) AS dist
             |  FROM e JOIN d${k - 1} dp ON e.src = dp.node
             |  GROUP BY e.dst)""".stripMargin
        }.mkString(",\n")
        s"""
        WITH op AS (
          SELECT DISTINCT l_orderkey, l_partkey
          FROM lineitem JOIN part
            ON l_partkey = p_partkey AND p_size <= 10),
        pairs AS MATERIALIZED (
          SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
          FROM op a JOIN op b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        vs AS (SELECT DISTINCT v FROM (
                 SELECT pa AS v FROM pairs
                 UNION ALL SELECT pb FROM pairs) u),
        e AS MATERIALIZED (
          SELECT pa AS src, pb AS dst, 1 AS w FROM pairs
          UNION ALL SELECT pb, pa, 1 FROM pairs
          UNION ALL SELECT v, v, 0 FROM vs),
        d0 AS (SELECT min(v) AS node, 0 AS dist FROM vs),
        $steps
        SELECT cast(dist as int) AS hops, count(*) AS n_reached
        FROM d$hops GROUP BY dist ORDER BY hops"""
      },
    )
  }

  /** LABEL-PROPAGATION COMMUNITIES (synchronous LPA) over the
    * co-purchase graph: every node starts as its own community, then
    * each round adopts the MOST FREQUENT label among its neighbors —
    * ties broken by the smaller label, which (unlike vanilla LPA's
    * random tie-break) makes the fixed-round result a pure function of
    * the graph, reproducible on any cluster and in the oracle. The
    * self-loop-augmented edge list (the q_bfs trick) folds "my own
    * label votes once" into the one equi-join per round, so a round is
    * join + combinable count + a per-node argmax window over the
    * (node, label) count table — linear in |E|, the million-node
    * template. Three rounds (fixed count, the q_kcore rule: both
    * engines compute the identical number of steps); each round's
    * label table is localCheckpoint'd (the recursive-CTE lineage
    * lesson). Output: community histogram — label, member count, and
    * the spread of community sizes is the useful audit signal. */
  private def mkLpa(name: String, expand: Int): GQuery = {
    val rounds = 3
    GQuery(
      name,
      (spark, dir) => {
        import spark.implicits._
        val op = Tables.lineitem(spark, dir)
          .join(Tables.part(spark, dir),
            $"l_partkey" === $"p_partkey" && $"p_size" <= 10)
          .select($"l_orderkey", $"l_partkey")
          // r15: no .distinct() before the collect_set groupBy — the set
          // agg dedups per order anyway; the distinct was a full extra
          // shuffle of the (order, part) pairs for the same ps arrays.
        val und0 = op.groupBy($"l_orderkey")
          .agg(sort_array(collect_set($"l_partkey")).as("ps"))
          .filter(size($"ps") >= 2)
          .select(explode(expr(
            "flatten(transform(sequence(1, size(ps)-1), i -> " +
              "transform(sequence(i+1, size(ps)), j -> " +
              "struct(element_at(ps, i) as pa, element_at(ps, j) as pb))))"))
            .as("pr"))
          .select($"pr.pa".as("pa"), $"pr.pb".as("pb"))
          .distinct()
        // ×expand replication (xdocs explode-of-sequence idiom): k
        // disjoint copies, both endpoints shifted k·10,000,000, so each
        // LPA round's join + count + argmax window moves 10× the rows.
        val und =
          if (expand <= 1) und0
          else und0.select($"pa", $"pb",
              explode(expr(s"sequence(0, ${expand - 1})")).as("k"))
            .select(($"pa" + $"k".cast("long") * lit(10000000L)).as("pa"),
              ($"pb" + $"k".cast("long") * lit(10000000L)).as("pb"))
        val verts = und.select($"pa".as("v"))
          .unionByName(und.select($"pb".as("v"))).distinct()
        // r15 (guide §2.4, the mkPagerank co-partitioning idiom), ×10
        // twin only: hash-partition the edge list on src BEFORE its
        // checkpoint so no round re-shuffles + re-sorts it (the label
        // side exits its per-round window partitioned by the same key;
        // shuffle_hash kills the sorts). A/B: xxl 5.8 → 4.3-4.8 s; the
        // 1× variant measured ~0.3 s WORSE (the extra repartition of a
        // small edge list outweighs 3 small saved shuffles), so the
        // declared query keeps the r14 shape.
        val e0 = und.select($"pa".as("src"), $"pb".as("dst"))
          .unionByName(und.select($"pb".as("src"), $"pa".as("dst")))
          .unionByName(verts.select($"v".as("src"), $"v".as("dst")))
        val e = (if (expand > 1)
            e0.repartition(spark.sparkContext.defaultParallelism, $"src")
          else e0).localCheckpoint()
        // per-round checkpoints measured FASTER here (2.75s vs 3.66s
        // un-checkpointed at sf0.1) despite the labels being
        // single-reference: truncating the lineage keeps each round's
        // optimization + scheduling unit small
        var l = verts.withColumn("lbl", $"v")
        for (_ <- 1 to rounds) {
          val lSide = if (expand > 1) l.hint("shuffle_hash") else l
          val counts = e.join(lSide, $"src" === $"v")
            .groupBy($"dst", $"lbl").agg(count(lit(1)).as("n"))
          l = counts
            .withColumn("rk", row_number().over(
              Window.partitionBy($"dst").orderBy($"n".desc, $"lbl")))
            .filter($"rk" === 1)
            .select($"dst".as("v"), $"lbl")
            .localCheckpoint()
        }
        l.groupBy($"lbl".as("community"))
          .agg(count(lit(1)).cast("int").as("n_members"),
            min($"v").as("min_member"), max($"v").as("max_member"))
          .orderBy($"community")
      },
      Some {
        val chain = (1 to rounds).map { i =>
          s"""c$i AS (
             |  SELECT e.dst AS v, l.lbl AS lbl, count(*) AS n
             |  FROM e JOIN l${i - 1} l ON e.src = l.v
             |  GROUP BY 1, 2),
             |l$i AS MATERIALIZED (
             |  SELECT v, lbl FROM (
             |    SELECT v, lbl, row_number() OVER (PARTITION BY v
             |      ORDER BY n DESC, lbl) AS rk FROM c$i) t
             |  WHERE rk = 1)""".stripMargin
        }.mkString(",\n")
        s"""
        WITH op AS (
          SELECT DISTINCT l_orderkey, l_partkey
          FROM lineitem JOIN part
            ON l_partkey = p_partkey AND p_size <= 10),
        pairs0 AS (
          SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
          FROM op a JOIN op b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        pairs AS (${
          if (expand <= 1) "SELECT pa, pb FROM pairs0"
          else
            s"""SELECT pa + k * 10000000 AS pa, pb + k * 10000000 AS pb
          FROM pairs0, unnest(generate_series(0, ${expand - 1})) AS xk(k)"""
        }),
        verts AS (
          SELECT pa AS v FROM pairs UNION SELECT pb FROM pairs),
        e AS MATERIALIZED (
          SELECT pa AS src, pb AS dst FROM pairs
          UNION ALL SELECT pb, pa FROM pairs
          UNION ALL SELECT v, v FROM verts),
        l0 AS (SELECT v, v AS lbl FROM verts),
        $chain
        SELECT lbl AS community, cast(count(*) as int) AS n_members,
               min(v) AS min_member, max(v) AS max_member
        FROM l$rounds GROUP BY lbl ORDER BY community"""
      },
    )
  }

  val qLpa: GQuery = mkLpa("q_lpa", 1)

  /** ×10 scaling twin: 10 disjoint id-shifted copies of the co-purchase
    * graph, so each LPA round's edge join, label count, and per-node
    * argmax window run over 10× the rows — a measured scale point for
    * the iterative graph family (r14 verdict item 2). */
  val qLpaXxl: GQuery = mkLpa("q_lpa_xxl", 10)

  /** HITS (hubs & authorities) on the DIRECTED supplier→brand bipartite
    * graph: two full hub/authority rounds with L1 normalization per
    * half-step. Each half-step is ONE equi-join of scores with the
    * distinct (supplier, brand) edge list + ONE combinable groupBy —
    * linear in |E| like q_markov, whose float contract it follows
    * exactly (per-term rN 12 before an exact decimal(30,12) sum; the
    * normalizing total is itself a decimal sum, so the divisor is
    * bit-identical everywhere). Output: per-brand authority after round
    * 2, the "which brands does the well-stocked supplier base endorse"
    * ranking. */
  val qHits: GQuery = GQuery(
    "q_hits",
    (spark, dir) => {
      import spark.implicits._
      val e = Tables.lineitem(spark, dir)
        .join(Tables.part(spark, dir), $"l_partkey" === $"p_partkey")
        .select($"l_suppkey".as("s"), $"p_brand".as("b"))
        .distinct()
        .localCheckpoint()
      var auth = e.select($"b").distinct().withColumn("a", lit(1.0))
      for (_ <- 1 to 2) {
        val hubRaw = e.join(auth, "b")
          .select($"s", rN($"a", 12).as("t"))
          .groupBy($"s")
          .agg(sum($"t".cast("decimal(30,12)")).cast("double").as("h"))
        val hubTot = hubRaw.agg(
          sum(rN($"h", 12).cast("decimal(30,12)")).cast("double").as("ht"))
        val hub = hubRaw.crossJoin(broadcast(hubTot))
          .select($"s", ($"h" / $"ht").as("h"))
        val authRaw = e.join(hub, "s")
          .select($"b", rN($"h", 12).as("t"))
          .groupBy($"b")
          .agg(sum($"t".cast("decimal(30,12)")).cast("double").as("a"))
        val authTot = authRaw.agg(
          sum(rN($"a", 12).cast("decimal(30,12)")).cast("double").as("at"))
        auth = authRaw.crossJoin(broadcast(authTot))
          .select($"b", ($"a" / $"at").as("a"))
      }
      auth.select($"b".as("brand"), r6($"a" * lit(1000.0)).as("authority_pm"))
        .orderBy($"brand")
    },
    Some {
      def round(i: Int, prev: String): String =
        s"""hr$i AS (
           |  SELECT s, cast(sum(cast(${rNSql("a", 12)} as decimal(30,12)))
           |    as double) AS h
           |  FROM e JOIN $prev USING (b) GROUP BY s),
           |ht$i AS (SELECT cast(sum(cast(${rNSql("h", 12)}
           |  as decimal(30,12))) as double) AS ht FROM hr$i),
           |h$i AS (SELECT s, h / ht AS h FROM hr$i CROSS JOIN ht$i),
           |ar$i AS (
           |  SELECT b, cast(sum(cast(${rNSql("h", 12)} as decimal(30,12)))
           |    as double) AS a
           |  FROM e JOIN h$i USING (s) GROUP BY b),
           |at$i AS (SELECT cast(sum(cast(${rNSql("a", 12)}
           |  as decimal(30,12))) as double) AS at FROM ar$i),
           |a$i AS (SELECT b, a / at AS a FROM ar$i CROSS JOIN at$i)"""
          .stripMargin
      s"""
      WITH e AS MATERIALIZED (
        SELECT DISTINCT l_suppkey AS s, p_brand AS b
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      a0 AS (SELECT DISTINCT b, cast(1.0 as double) AS a FROM e),
      ${round(1, "a0")},
      ${round(2, "a1")}
      SELECT b AS brand,
             ${r6Sql("a * cast(1000.0 as double)")} AS authority_pm
      FROM a2 ORDER BY brand"""
    },
  )

  /** DEGREE ASSORTATIVITY of the co-purchase graph — do high-degree
    * items co-occur with high-degree items? Newman's r as a pure
    * INTEGER computation: with M edges, S1 = Σ(j+k), S2 = Σ(j²+k²),
    * Sjk = Σ j·k over undirected edges (j, k endpoint degrees),
    * r = (4M·Sjk − S1²)/(2M·S2 − S1²) — every sum is exact int64
    * (bounded by |E|·maxdeg² ≈ 1e10 here, ≪ 2⁶³), so the whole
    * statistic is ONE IEEE division. Degrees are a combinable groupBy
    * over the doubled edge list; the per-edge (j,k) attach is two
    * broadcast joins on the endpoint. */
  val qAssortativity: GQuery = GQuery(
    "q_assortativity",
    (spark, dir) => {
      import spark.implicits._
      val op = Tables.lineitem(spark, dir)
        .join(Tables.part(spark, dir),
          $"l_partkey" === $"p_partkey" && $"p_size" <= 10)
        .select($"l_orderkey", $"l_partkey")
        // r15: no .distinct() before the collect_set groupBy — the set
        // agg dedups per order anyway; the distinct was a full extra
        // shuffle of the (order, part) pairs for the same ps arrays.
      val und = op.groupBy($"l_orderkey")
        .agg(sort_array(collect_set($"l_partkey")).as("ps"))
        .filter(size($"ps") >= 2)
        .select(explode(expr(
          "flatten(transform(sequence(1, size(ps)-1), i -> " +
            "transform(sequence(i+1, size(ps)), j -> " +
            "struct(element_at(ps, i) as pa, element_at(ps, j) as pb))))"))
          .as("pr"))
        .select($"pr.pa".as("pa"), $"pr.pb".as("pb"))
        .distinct()
      val deg = und.select($"pa".as("v"))
        .unionByName(und.select($"pb".as("v")))
        .groupBy($"v").agg(count(lit(1)).as("d"))
      val m = und
        .join(broadcast(deg.select($"v".as("pa"), $"d".as("j"))), "pa")
        .join(broadcast(deg.select($"v".as("pb"), $"d".as("k"))), "pb")
        .agg(count(lit(1)).as("m"),
          sum($"j" + $"k").as("s1"),
          sum($"j" * $"j" + $"k" * $"k").as("s2"),
          sum($"j" * $"k").as("sjk"))
      m.select($"m".cast("int").as("n_edges"),
        r6((lit(4L) * $"m" * $"sjk" - $"s1" * $"s1").cast("double") /
          (lit(2L) * $"m" * $"s2" - $"s1" * $"s1").cast("double"))
          .as("assortativity"))
    },
    Some(s"""
      WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey
        FROM lineitem JOIN part
          ON l_partkey = p_partkey AND p_size <= 10),
      und AS (
        SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      deg AS (
        SELECT v, count(*) AS d FROM (
          SELECT pa AS v FROM und UNION ALL SELECT pb FROM und) t
        GROUP BY v),
      s AS (
        SELECT cast(count(*) as bigint) AS m,
               cast(sum(j + k) as bigint) AS s1,
               cast(sum(j * j + k * k) as bigint) AS s2,
               cast(sum(j * k) as bigint) AS sjk
        FROM (SELECT da.d AS j, db.d AS k
              FROM und
              JOIN deg da ON da.v = und.pa
              JOIN deg db ON db.v = und.pb) e)
      SELECT cast(m as int) AS n_edges,
             ${r6Sql("cast(4 * m * sjk - s1 * s1 as double) / " +
               "cast(2 * m * s2 - s1 * s1 as double)")} AS assortativity
      FROM s"""),
  )

  /** MODULARITY of the q_lpa communities — the quality score that turns
    * "LPA produced labels" into "LPA found structure": Q = Σ_c [e_c/m −
    * (d_c/2m)²] over the SAME 3-round label propagation (re-derived
    * in-query with the identical fixed-round chain, so oracle and engine
    * agree label for label). e_c (intra-community edge count) is one
    * equi-join of the undirected edge list with the final labels on both
    * endpoints; d_c is a combinable degree sum per community (communities
    * with no internal edge still contribute their −(d_c/2m)² via the
    * left join + coalesce). Integer counts throughout; per-community
    * terms are IEEE-rounded then decimal-summed (dsum contract). */
  val qModularity: GQuery = {
    val rounds = 3
    GQuery(
      "q_modularity",
      (spark, dir) => {
        import spark.implicits._
        val op = Tables.lineitem(spark, dir)
          .join(Tables.part(spark, dir),
            $"l_partkey" === $"p_partkey" && $"p_size" <= 10)
          .select($"l_orderkey", $"l_partkey")
          // r15: no .distinct() before the collect_set groupBy — the set
          // agg dedups per order anyway; the distinct was a full extra
          // shuffle of the (order, part) pairs for the same ps arrays.
        val und = op.groupBy($"l_orderkey")
          .agg(sort_array(collect_set($"l_partkey")).as("ps"))
          .filter(size($"ps") >= 2)
          .select(explode(expr(
            "flatten(transform(sequence(1, size(ps)-1), i -> " +
              "transform(sequence(i+1, size(ps)), j -> " +
              "struct(element_at(ps, i) as pa, element_at(ps, j) as pb))))"))
            .as("pr"))
          .select($"pr.pa".as("pa"), $"pr.pb".as("pb"))
          .distinct()
          .localCheckpoint()
        val verts = und.select($"pa".as("v"))
          .unionByName(und.select($"pb".as("v"))).distinct()
        val e = und.select($"pa".as("src"), $"pb".as("dst"))
          .unionByName(und.select($"pb".as("src"), $"pa".as("dst")))
          .unionByName(verts.select($"v".as("src"), $"v".as("dst")))
          .localCheckpoint()
        // in-loop labels are single-reference (no checkpoints, the q_lpa
        // rule); the FINAL labels feed three consumers (degree sum + both
        // endpoint joins), so only that table materializes
        var l = verts.withColumn("lbl", $"v")
        for (_ <- 1 to rounds) {
          val counts = e.join(l, $"src" === $"v")
            .groupBy($"dst", $"lbl").agg(count(lit(1)).as("n"))
          l = counts
            .withColumn("rk", row_number().over(
              Window.partitionBy($"dst").orderBy($"n".desc, $"lbl")))
            .filter($"rk" === 1)
            .select($"dst".as("v"), $"lbl")
        }
        l = l.localCheckpoint()
        val mm = und.agg(count(lit(1)).as("m"))
        val degC = und.select($"pa".as("v"))
          .unionByName(und.select($"pb".as("v")))
          .join(l, "v")
          .groupBy($"lbl").agg(count(lit(1)).as("dc"))
        val ec = und
          .join(l.select($"v".as("pa"), $"lbl".as("la")), "pa")
          .join(l.select($"v".as("pb"), $"lbl".as("lb")), "pb")
          .filter($"la" === $"lb")
          .groupBy($"la".as("lbl")).agg(count(lit(1)).as("ec"))
        val md = $"m".cast("double")
        degC.join(ec, Seq("lbl"), "left")
          .crossJoin(broadcast(mm))
          .select($"m",
            rN(coalesce($"ec", lit(0L)).cast("double") / md -
              ($"dc".cast("double") / (lit(2.0) * md)) *
                ($"dc".cast("double") / (lit(2.0) * md)), 9).as("term"))
          .agg(count(lit(1)).cast("int").as("n_communities"),
            max($"m").as("m_edges"),
            dsum($"term", 6).as("modularity"))
          .select($"n_communities", $"m_edges", $"modularity")
      },
      Some {
        val chain = (1 to rounds).map { i =>
          s"""c$i AS (
             |  SELECT e.dst AS v, l.lbl AS lbl, count(*) AS n
             |  FROM e JOIN l${i - 1} l ON e.src = l.v
             |  GROUP BY 1, 2),
             |l$i AS MATERIALIZED (
             |  SELECT v, lbl FROM (
             |    SELECT v, lbl, row_number() OVER (PARTITION BY v
             |      ORDER BY n DESC, lbl) AS rk FROM c$i) t
             |  WHERE rk = 1)""".stripMargin
        }.mkString(",\n")
        s"""
        WITH op AS (
          SELECT DISTINCT l_orderkey, l_partkey
          FROM lineitem JOIN part
            ON l_partkey = p_partkey AND p_size <= 10),
        pairs AS MATERIALIZED (
          SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
          FROM op a JOIN op b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        verts AS (
          SELECT pa AS v FROM pairs UNION SELECT pb FROM pairs),
        e AS MATERIALIZED (
          SELECT pa AS src, pb AS dst FROM pairs
          UNION ALL SELECT pb, pa FROM pairs
          UNION ALL SELECT v, v FROM verts),
        l0 AS (SELECT v, v AS lbl FROM verts),
        $chain,
        mm AS (SELECT cast(count(*) as bigint) AS m FROM pairs),
        degc AS (
          SELECT lbl, count(*) AS dc FROM (
            SELECT pa AS v FROM pairs UNION ALL SELECT pb FROM pairs) t
          JOIN l$rounds USING (v) GROUP BY lbl),
        ec AS (
          SELECT la.lbl AS lbl, count(*) AS ec
          FROM pairs
          JOIN l$rounds la ON la.v = pairs.pa
          JOIN l$rounds lb ON lb.v = pairs.pb
          WHERE la.lbl = lb.lbl
          GROUP BY 1),
        terms AS (
          SELECT ${rNSql("cast(coalesce(ec, 0) as double) / cast(m as " +
            "double) - (cast(dc as double) / (2.0 * cast(m as double))) * " +
            "(cast(dc as double) / (2.0 * cast(m as double)))", 9)} AS term,
                 m
          FROM degc LEFT JOIN ec USING (lbl) CROSS JOIN mm)
        SELECT cast(count(*) as int) AS n_communities,
               cast(max(m) as bigint) AS m_edges,
               ${dsumSql("term", 6)} AS modularity
        FROM terms"""
      },
    )
  }

  /** TWO-HOP REACH per node — the "friends of friends" expansion that
    * prices out recommendation fan-out before anyone runs it: for each
    * co-purchase node, how many nodes sit at distance EXACTLY 2
    * (2-hop paths minus self minus direct neighbors)? One self
    * equi-join of the doubled edge list on the middle vertex gives
    * 2-hop pairs (Σ deg² work — the quantity this query measures);
    * strictness is a LEFT ANTI join against the edge list; per-node
    * counts are combinable. The deg²-scaling is exactly why the graph
    * keeps the p_size restriction — and why the reported
    * reach-per-degree ratio is the capacity-planning number. */
  val qTwoHop: GQuery = GQuery(
    "q_2hop",
    (spark, dir) => {
      import spark.implicits._
      val op = Tables.lineitem(spark, dir)
        .join(Tables.part(spark, dir),
          $"l_partkey" === $"p_partkey" && $"p_size" <= 10)
        .select($"l_orderkey", $"l_partkey")
        // r15: no .distinct() before the collect_set groupBy — the set
        // agg dedups per order anyway; the distinct was a full extra
        // shuffle of the (order, part) pairs for the same ps arrays.
      val und = op.groupBy($"l_orderkey")
        .agg(sort_array(collect_set($"l_partkey")).as("ps"))
        .filter(size($"ps") >= 2)
        .select(explode(expr(
          "flatten(transform(sequence(1, size(ps)-1), i -> " +
            "transform(sequence(i+1, size(ps)), j -> " +
            "struct(element_at(ps, i) as pa, element_at(ps, j) as pb))))"))
          .as("pr"))
        .select($"pr.pa".as("pa"), $"pr.pb".as("pb"))
        .distinct()
      val e = und.select($"pa".as("src"), $"pb".as("dst"))
        .unionByName(und.select($"pb".as("src"), $"pa".as("dst")))
        .localCheckpoint()
      val two = e.as("a").join(e.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
        .filter($"src" =!= $"dst")
        .distinct()
      val strict = two.join(e, Seq("src", "dst"), "left_anti")
      val deg = e.groupBy($"src").agg(count(lit(1)).as("deg"))
      deg.join(strict.groupBy($"src").agg(count(lit(1)).as("n2")),
          Seq("src"), "left")
        .select($"src".as("node"), $"deg".cast("int").as("degree"),
          coalesce($"n2", lit(0L)).cast("int").as("n_2hop"),
          r6(coalesce($"n2", lit(0L)).cast("double") /
            $"deg".cast("double")).as("reach_per_degree"))
        .orderBy($"node")
    },
    Some(s"""
      WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey
        FROM lineitem JOIN part
          ON l_partkey = p_partkey AND p_size <= 10),
      und AS (
        SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      e AS MATERIALIZED (
        SELECT pa AS src, pb AS dst FROM und
        UNION ALL SELECT pb, pa FROM und),
      two AS (
        SELECT DISTINCT a.src, b.dst
        FROM e a JOIN e b ON a.dst = b.src
        WHERE a.src <> b.dst),
      strict AS (
        SELECT t.src, t.dst FROM two t
        LEFT JOIN e ON e.src = t.src AND e.dst = t.dst
        WHERE e.src IS NULL),
      deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
      n2 AS (SELECT src, count(*) AS n2 FROM strict GROUP BY src)
      SELECT d.src AS node, cast(d.deg as int) AS degree,
             cast(coalesce(n2.n2, 0) as int) AS n_2hop,
             ${r6Sql("cast(coalesce(n2.n2, 0) as double) / " +
               "cast(d.deg as double)")} AS reach_per_degree
      FROM deg d LEFT JOIN n2 ON n2.src = d.src
      ORDER BY node"""),
  )

  /** ENTROPY RATE of the behavioral Markov chain — how predictable is
    * the NEXT event given the current one? H = −Σᵢ πᵢ Σⱼ pᵢⱼ ln pᵢⱼ
    * with π approximated by q_markov's 4-step distribution (same
    * matrix, same power iteration, same decimal-staging contract), so
    * the two queries agree state for state. ln runs on the 12-dp
    * rounded pᵢⱼ (identical inputs in both engines, the q_entropy ln
    * contract) and the 25 weighted terms decimal-sum. One row:
    * state count + the rate in nats — 0 means deterministic behavior,
    * ln(5)≈1.609 means uniform chaos. */
  val qEntropyRate: GQuery = {
    val steps = 4
    GQuery(
      "q_entropy_rate",
      (spark, dir) => {
        import spark.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val m = Tables.events(spark, dir)
          .select($"user_id", $"event_type", $"ts", $"event_id")
          .withColumn("prev_type", lag($"event_type", 1).over(w))
          .filter($"prev_type".isNotNull)
          .groupBy($"prev_type".as("i"), $"event_type".as("j"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p", rN($"n".cast("double") /
            sum($"n").over(Window.partitionBy($"i")).cast("double"), 12))
          .select($"i", $"j", $"p")
          .localCheckpoint()
        var v = m.select($"i".as("state")).distinct()
          .withColumn("prob", lit(0.2))
        for (_ <- 1 to steps) {
          v = v.join(m, $"state" === $"i")
            .select($"j", rN($"prob" * $"p", 12).as("term"))
            .groupBy($"j")
            .agg(sum($"term".cast("decimal(30,12)")).cast("double")
              .as("prob"))
            .select($"j".as("state"), $"prob")
        }
        v.join(m, $"state" === $"i")
          .select(rN(-$"prob" * $"p" * log($"p"), 12).as("t"))
          .agg(count(lit(1)).cast("int").as("n_transitions"),
            dsum($"t", 6).as("entropy_rate_nats"))
      },
      Some {
        val chain = (1 to steps).map { s =>
          s"""v$s AS (
             |  SELECT j AS state,
             |         cast(sum(cast(${rNSql(s"prob * p", 12)}
             |           as decimal(30,12))) as double) AS prob
             |  FROM v${s - 1} JOIN m ON state = i
             |  GROUP BY j)""".stripMargin
        }.mkString(",\n")
        s"""
        WITH st AS (
          SELECT user_id, event_type,
                 lag(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY date_trunc('second', ts), event_id) AS prev_type
          FROM events),
        cnt AS (
          SELECT prev_type AS i, event_type AS j, count(*) AS n
          FROM st WHERE prev_type IS NOT NULL
          GROUP BY i, j),
        m AS MATERIALIZED (
          SELECT i, j, ${rNSql("cast(n as double) / cast(sum(n) OVER " +
                "(PARTITION BY i) as double)", 12)} AS p
          FROM cnt),
        v0 AS (SELECT DISTINCT i AS state, cast(0.2 as double) AS prob
               FROM m),
        $chain,
        t AS (
          SELECT ${rNSql("-prob * p * ln(p)", 12)} AS t
          FROM v$steps JOIN m ON state = i)
        SELECT cast(count(*) as int) AS n_transitions,
               ${dsumSql("t", 6)} AS entropy_rate_nats
        FROM t"""
      },
    )
  }

  /** HARMONIC CLOSENESS CENTRALITY for five deterministic seed vertices
    * (the 5 smallest part ids in the co-purchase graph) by MULTI-SOURCE
    * min-plus BFS: the q_bfs iteration run once with a composite
    * (seed, node) distance key, so five centralities cost the SAME four
    * equi-join + min-groupBy rounds as one — the standard trick for
    * batched centrality probes at scale (state is |seeds|·|reached|,
    * never |V|²). Harmonic form C(s) = Σ 1/d(v) handles disconnected
    * components without an infinity sentinel; the 4-hop truncation
    * makes it a local centrality (documented, same radius as q_bfs).
    * The per-seed 1/d sum is decimal-staged (order-free); everything
    * else is exact integers. */
  val qCloseness: GQuery = {
    val hops = 4
    GQuery(
      "q_closeness",
      (spark, dir) => {
        import spark.implicits._
        val op = Tables.lineitem(spark, dir)
          .join(Tables.part(spark, dir),
            $"l_partkey" === $"p_partkey" && $"p_size" <= 10)
          .select($"l_orderkey", $"l_partkey")
          // r15: no .distinct() before the collect_set groupBy — the set
          // agg dedups per order anyway; the distinct was a full extra
          // shuffle of the (order, part) pairs for the same ps arrays.
        val und = op.groupBy($"l_orderkey")
          .agg(sort_array(collect_set($"l_partkey")).as("ps"))
          .filter(size($"ps") >= 2)
          .select(explode(expr(
            "flatten(transform(sequence(1, size(ps)-1), i -> " +
              "transform(sequence(i+1, size(ps)), j -> " +
              "struct(element_at(ps, i) as pa, element_at(ps, j) as pb))))"))
            .as("pr"))
          .select($"pr.pa".as("pa"), $"pr.pb".as("pb"))
          .distinct()
          .localCheckpoint()
        val vs = und.select($"pa".as("v"))
          .unionByName(und.select($"pb".as("v"))).distinct()
        val e = und.select($"pa".as("src"), $"pb".as("dst"), lit(1).as("w"))
          .unionByName(und.select($"pb".as("src"), $"pa".as("dst"),
            lit(1).as("w")))
          .unionByName(vs.select($"v".as("src"), $"v".as("dst"),
            lit(0).as("w")))
          .localCheckpoint()
        var dist = vs.orderBy($"v").limit(5)
          .select($"v".as("seed"), $"v".as("node"), lit(0).as("dist"))
        for (_ <- 1 to hops) {
          dist = e.join(dist, $"src" === $"node")
            .groupBy($"seed", $"dst")
            .agg(min($"dist" + $"w").as("d2"))
            .select($"seed", $"dst".as("node"), $"d2".as("dist"))
        }
        dist.filter($"dist" > 0)
          .select($"seed", $"dist",
            rN(lit(1.0) / $"dist".cast("double"), 6).as("inv"))
          .groupBy($"seed")
          .agg(count(lit(1)).as("n_reached"), sum($"dist").as("sum_dist"),
            dsum($"inv", 6).as("harmonic"))
          .orderBy($"seed")
      },
      Some {
        val steps = (1 to hops).map { k =>
          s"""d$k AS (
             |  SELECT dp.seed AS seed, e.dst AS node,
             |         min(dp.dist + e.w) AS dist
             |  FROM e JOIN d${k - 1} dp ON e.src = dp.node
             |  GROUP BY dp.seed, e.dst)""".stripMargin
        }.mkString(",\n")
        s"""
        WITH op AS (
          SELECT DISTINCT l_orderkey, l_partkey
          FROM lineitem JOIN part
            ON l_partkey = p_partkey AND p_size <= 10),
        pairs AS MATERIALIZED (
          SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
          FROM op a JOIN op b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        vs AS (SELECT DISTINCT v FROM (
                 SELECT pa AS v FROM pairs
                 UNION ALL SELECT pb FROM pairs) u),
        e AS MATERIALIZED (
          SELECT pa AS src, pb AS dst, 1 AS w FROM pairs
          UNION ALL SELECT pb, pa, 1 FROM pairs
          UNION ALL SELECT v, v, 0 FROM vs),
        d0 AS (SELECT v AS seed, v AS node, 0 AS dist
               FROM (SELECT v FROM vs ORDER BY v LIMIT 5) s),
        $steps
        SELECT seed, count(*) AS n_reached,
               cast(sum(dist) as bigint) AS sum_dist,
               ${dsumSql(rNSql(
                 "cast(1.0 as double) / cast(dist as double)", 6), 6)}
                 AS harmonic
        FROM d$hops WHERE dist > 0 GROUP BY seed ORDER BY seed"""
      },
    )
  }

  /** NEXT-EVENT PREDICTION BASELINE — the bigram majority-vote model
    * every sequence model is benchmarked against: for each state,
    * predict the most frequent successor (ties to the lexicographically
    * smaller type — total order, cross-engine stable) and score it
    * in-sample. Rides q_markov's transition pairs (one per-user lag
    * window with the (ts, event_id) tiebreak); prediction + accuracy
    * come from the |types|²-bounded count table — pure integers until
    * the final rate. */
  val qSeqPredict: GQuery = GQuery(
    "q_seq_predict",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select($"user_id", $"event_type", $"ts", $"event_id")
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val pairs = ev.withColumn("prev", lag($"event_type", 1).over(w))
        .filter($"prev".isNotNull)
      val cnt = pairs.groupBy($"prev", $"event_type")
        .agg(count(lit(1)).as("n"))
      val wp = Window.partitionBy($"prev").orderBy($"n".desc, $"event_type")
      cnt.withColumn("rn", row_number().over(wp))
        .groupBy($"prev")
        .agg(sum($"n").as("n_state"),
          max(when($"rn" === 1, $"event_type")).as("predicted"),
          max(when($"rn" === 1, $"n")).as("n_correct"))
        .select($"prev".as("state"), $"predicted", $"n_state", $"n_correct",
          r6($"n_correct".cast("double") / $"n_state".cast("double"))
            .as("accuracy"))
        .orderBy($"state")
    },
    Some(s"""
      WITH st AS (
        SELECT user_id, event_type,
               lag(event_type, 1) OVER (PARTITION BY user_id
                 ORDER BY date_trunc('second', ts), event_id) AS prev
        FROM events),
      cnt AS (
        SELECT prev, event_type, cast(count(*) as bigint) AS n
        FROM st WHERE prev IS NOT NULL
        GROUP BY prev, event_type),
      rk AS (
        SELECT prev, event_type, n,
               row_number() OVER (PARTITION BY prev
                 ORDER BY n DESC, event_type) AS rn
        FROM cnt)
      SELECT prev AS state,
             max(CASE WHEN rn = 1 THEN event_type END) AS predicted,
             cast(sum(n) as bigint) AS n_state,
             cast(max(CASE WHEN rn = 1 THEN n END) as bigint) AS n_correct,
             ${r6Sql("cast(max(CASE WHEN rn = 1 THEN n END) as double) / " +
               "cast(sum(n) as double)")} AS accuracy
      FROM rk GROUP BY prev ORDER BY state"""),
  )

  /** KATZ CENTRALITY (truncated at 3 walk lengths) on the co-purchase
    * item graph — the walk-counting complement to q_pagerank's
    * random-surfer rank: x = Σ_k α^k (Aᵀ)^k 1 counts attenuated walks
    * INTO a node, so a part is central when many (possibly low-degree)
    * parts reach it — no degree normalization, which is exactly what
    * distinguishes it from PageRank on this graph. Same scale template
    * as q_pagerank/q_hits: edge list built once from the per-order
    * item-pair explode (bounded per order, never all-pairs),
    * checkpointed; each iteration is ONE equi-join + ONE combinable
    * 12-dp-decimal-staged groupBy, linear in |E|; α = 0.05 keeps the
    * truncated series convergent for any realistic degree. Output:
    * top-50 by score with total-order tiebreak. */
  val qKatz: GQuery = {
    val iters = 3
    GQuery(
      "q_katz",
      (spark, dir) => {
        import spark.implicits._
        val op = Tables.lineitem(spark, dir)
          .join(Tables.part(spark, dir).filter($"p_size" <= 10)
            .select($"p_partkey"), $"l_partkey" === $"p_partkey")
          .select($"l_orderkey", $"l_partkey")
          // r15: no .distinct() before the collect_set groupBy — the set
          // agg dedups per order anyway; the distinct was a full extra
          // shuffle of the (order, part) pairs for the same ps arrays.
        val pr = op
          .groupBy($"l_orderkey")
          .agg(sort_array(collect_set($"l_partkey")).as("ps"))
          .filter(size($"ps") >= 2)
          .select(explode(expr(
            "flatten(transform(sequence(1, size(ps)-1), i -> " +
              "transform(sequence(i+1, size(ps)), j -> " +
              "struct(element_at(ps, i) as p1, element_at(ps, j) as p2))))"))
            .as("pr"))
          .select($"pr.p1".as("p1"), $"pr.p2".as("p2")).distinct()
        val e = pr.select($"p1".as("src"), $"p2".as("dst"))
          .unionByName(pr.select($"p2".as("src"), $"p1".as("dst")))
          .localCheckpoint()
        val nodes = e.select($"src".as("node")).distinct()
        var x = nodes.withColumn("x", lit(1.0))
        for (_ <- 1 to iters) {
          val nbr = e.join(x, $"src" === $"node")
            .select($"dst", rN($"x", 12).as("t"))
            .groupBy($"dst")
            .agg(sum($"t".cast("decimal(30,12)")).cast("double").as("s"))
          x = nodes.join(nbr, $"node" === $"dst", "left_outer")
            .select($"node",
              (lit(1.0) + lit(0.05) * coalesce($"s", lit(0.0))).as("x"))
        }
        x.select($"node".as("part"), r6($"x").as("katz"))
          .orderBy($"katz".desc, $"part")
          .limit(50)
      },
      Some {
        val chain = (1 to iters).map { k =>
          s"""x$k AS (
             |  SELECT n.node,
             |         cast(1.0 as double) + cast(0.05 as double) *
             |           coalesce(s.s, cast(0.0 as double)) AS x
             |  FROM nodes n LEFT JOIN (
             |    SELECT dst,
             |           cast(sum(cast(${rNSql("x", 12)} as decimal(30,12)))
             |             as double) AS s
             |    FROM e JOIN x${k - 1} ON src = node
             |    GROUP BY dst) s ON n.node = s.dst)""".stripMargin
        }.mkString(",\n")
        s"""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM lineitem JOIN part ON l_partkey = p_partkey
                    WHERE p_size <= 10),
        pr AS (
          SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
          FROM op a JOIN op b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        e AS MATERIALIZED (
          SELECT p1 AS src, p2 AS dst FROM pr
          UNION ALL
          SELECT p2 AS src, p1 AS dst FROM pr),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        x0 AS (SELECT node, cast(1.0 as double) AS x FROM nodes),
        $chain
        SELECT node AS part, ${r6Sql("x")} AS katz
        FROM x$iters
        ORDER BY katz DESC, part LIMIT 50"""
      },
    )
  }

  /** WEIGHTED RECIPROCITY of the session transition graph — how
    * symmetric is behavior flow? r = Σ min(w_ij, w_ji) / Σ w_ij over
    * ordered type pairs i ≠ j (Squartini–Fagiolo weighted form): 1
    * means every i→j flow is matched by an equal j→i flow. The
    * transition counts are q_markov's one lag-window pass collapsed to
    * a ≤25-cell matrix; the reciprocal join is a self equi-join on the
    * reversed key over that tiny table. Also reports the unweighted
    * (binary) reciprocity and the pair count. */
  val qReciprocity: GQuery = GQuery(
    "q_reciprocity",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val m = Tables.events(spark, dir)
        .select($"user_id", $"event_type", $"ts", $"event_id")
        .withColumn("prev_type", lag($"event_type", 1).over(w))
        .filter($"prev_type".isNotNull && $"prev_type" =!= $"event_type")
        .groupBy($"prev_type".as("i"), $"event_type".as("j"))
        .agg(count(lit(1)).as("w_ij"))
      val rev = m.select($"i".as("ri"), $"j".as("rj"), $"w_ij".as("w_ji"))
      m.join(rev, $"i" === $"rj" && $"j" === $"ri", "left_outer")
        .select($"w_ij", coalesce($"w_ji", lit(0L)).as("w_ji"))
        .agg(count(lit(1)).as("n_edges"),
          sum($"w_ij").as("w_total"),
          sum(least($"w_ij", $"w_ji")).as("w_recip"),
          sum(when($"w_ji" > 0, 1L).otherwise(0L)).as("n_recip"))
        .select($"n_edges", $"w_total", $"w_recip",
          r6($"w_recip".cast("double") / $"w_total".cast("double"))
            .as("reciprocity_w"),
          r6($"n_recip".cast("double") / $"n_edges".cast("double"))
            .as("reciprocity_bin"))
    },
    Some(s"""
      WITH st AS (
        SELECT user_id, event_type,
               lag(event_type, 1) OVER (PARTITION BY user_id
                 ORDER BY date_trunc('second', ts), event_id) AS prev_type
        FROM events),
      m AS (
        SELECT prev_type AS i, event_type AS j, count(*) AS w_ij
        FROM st WHERE prev_type IS NOT NULL AND prev_type <> event_type
        GROUP BY i, j),
      p AS (
        SELECT m.w_ij, cast(coalesce(r.w_ij, 0) as bigint) AS w_ji
        FROM m LEFT JOIN m r ON m.i = r.j AND m.j = r.i)
      SELECT cast(count(*) as bigint) AS n_edges,
             cast(sum(w_ij) as bigint) AS w_total,
             cast(sum(least(w_ij, w_ji)) as bigint) AS w_recip,
             ${r6Sql("cast(sum(least(w_ij, w_ji)) as double) / " +
               "cast(sum(w_ij) as double)")} AS reciprocity_w,
             ${r6Sql("cast(sum(CASE WHEN w_ji > 0 THEN 1 ELSE 0 END) " +
               "as double) / cast(count(*) as double)")} AS reciprocity_bin
      FROM p"""),
  )

  val all: Seq[GQuery] = Seq(qBipartiteProj, qKcore, qMarkov, qBfs, qLpa,
    qHits, qAssortativity, qModularity, qTwoHop, qEntropyRate, qCloseness,
    qSeqPredict, qKatz, qReciprocity, qLpaXxl)
}
