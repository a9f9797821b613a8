package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.ops.TextOps

/** Crawl post-fetch surface (round-14 batch 3): the page-level policy
  * and frontier-hygiene operators a crawl applies AFTER the bytes
  * arrive — canonical-link dedup clusters, robots-meta index policy,
  * the politeness fetch schedule, and crawler-trap detection. The
  * first mile (WARC → HTTP → charset → strip) and the link/robots/
  * sitemap gates live in MultimodalQueries / IndexQueries; these four
  * consume the same URL canonicalization core ([[TextOps]]).
  */
object CrawlQueries {

  /** Per-domain Crawl-delay table for the schedule gate — one constant
    * drives the Spark DF and the SQL VALUES body. Domains absent here
    * take the operator's 1000 ms default (shop1/shop2 exercise it). */
  val CrawlDelays: Seq[(String, Long)] =
    Seq(("trap.example.net", 100L), ("shop0.com", 250L))

  private def crawlDelaysValues: String =
    CrawlDelays.map { case (dom, ms) => s"('$dom', $ms)" }.mkString(", ")

  /** Planted-URL fixture shared by the schedule and trap gates,
    * appended to the real document text (the extractor must coexist
    * with prose): a calendar-shaped PATH trap (500 distinct
    * `/cal/<id>/<id%7>` URLs folding to ONE `/cal/N/N` template), a
    * healthy mixed-case+:443 shop catalog (5 distinct `/p/<id%5>`
    * paths per domain — under any trap threshold), and a session-id
    * QUERY trap (`/s?sid=<id>` — one `/s` template, ~167 distinct
    * canonical URLs per shop domain, the query-parameter explosion
    * class). */
  private def crawlUrlFixtureCol =
    concat(col("text"),
      lit(" https://trap.example.net/cal/"), col("doc_id"),
      lit("/"), col("doc_id") % 7,
      lit(" https://Shop"), col("doc_id") % 3,
      lit(".COM:443/p/"), col("doc_id") % 5,
      lit(" http://shop"), col("doc_id") % 3,
      lit(".com/s?sid="), col("doc_id")).as("text")

  private val CrawlUrlFixtureTable =
    "(SELECT doc_id, text" +
      " || ' https://trap.example.net/cal/' || doc_id || '/'" +
      " || (doc_id % 7)" +
      " || ' https://Shop' || (doc_id % 3) || '.COM:443/p/'" +
      " || (doc_id % 5)" +
      " || ' http://shop' || (doc_id % 3) || '.com/s?sid=' || doc_id" +
      " AS text FROM documents)"

  /** robots.txt body fixture shared by the parse gate and the
    * parse→filter e2e gate: per file by %5 — a star group followed by
    * TWO exact-agent groups (merge; star drops), stacked user-agent
    * lines, a star-only file, comments + empty Disallow + uppercase
    * key + trailing comment, and an orphan rule before any group.
    * Hosts are per-doc (`h<doc_id>.com`). */
  private def robotsBodyCol =
    when(col("doc_id") % 5 === 0,
      concat(lit("User-agent: *\nDisallow: /a\nAllow: /a/b\n" +
        "User-agent: GraftBot\nDisallow: /g"), col("doc_id") % 3,
        lit("\nUser-agent: graftbot\nAllow: /g-ok")))
    .when(col("doc_id") % 5 === 1,
      lit("User-agent: graftbot\nUser-agent: other\nDisallow: /x"))
    .when(col("doc_id") % 5 === 2,
      concat(lit("User-agent: *\nDisallow: /star"), col("doc_id") % 4))
    .when(col("doc_id") % 5 === 3,
      lit("# top\nUser-agent: graftbot\nDisallow:\nALLOW: /ok # tail"))
    .otherwise(
      lit("Disallow: /orphan\nUser-agent: *\nDisallow: /tail"))

  private val RobotsBodyTable =
    "(SELECT doc_id, 'h' || doc_id || '.com' AS host," +
      " CASE doc_id % 5" +
      " WHEN 0 THEN 'User-agent: *' || chr(10) ||" +
      " 'Disallow: /a' || chr(10) || 'Allow: /a/b' || chr(10) ||" +
      " 'User-agent: GraftBot' || chr(10) || 'Disallow: /g' ||" +
      " (doc_id % 3) || chr(10) || 'User-agent: graftbot' ||" +
      " chr(10) || 'Allow: /g-ok'" +
      " WHEN 1 THEN 'User-agent: graftbot' || chr(10) ||" +
      " 'User-agent: other' || chr(10) || 'Disallow: /x'" +
      " WHEN 2 THEN 'User-agent: *' || chr(10) ||" +
      " 'Disallow: /star' || (doc_id % 4)" +
      " WHEN 3 THEN '# top' || chr(10) ||" +
      " 'User-agent: graftbot' || chr(10) || 'Disallow:' ||" +
      " chr(10) || 'ALLOW: /ok # tail'" +
      " ELSE 'Disallow: /orphan' || chr(10) ||" +
      " 'User-agent: *' || chr(10) || 'Disallow: /tail' END" +
      " AS text FROM documents)"

  private def robotsDocs(s: org.apache.spark.sql.SparkSession,
                         d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        concat(lit("h"), col("doc_id"), lit(".com")).as("host"),
        robotsBodyCol.as("text"))

  val defs: Seq[QueryDef] = Seq(

    // Canonical-link dedup clusters — sites self-declare the
    // authoritative copy of each page via <link rel="canonical">, and
    // grouping pages by their declared target yields dedup clusters
    // BEFORE any content hashing. Fixture per page (page_url carries
    // mixed case + :443): %4==0 → a stylesheet distractor FIRST, an
    // absolute canonical (mixed-case host + fragment) to the shared
    // /c/<id%10> target, then a SECOND conflicting canonical that
    // must lose (first-in-document-order wins); %4==1 → href-before-
    // rel, single quotes, root-relative target resolving against the
    // page host; %4==2 → uppercase REL/Canonical pointing at the
    // page's OWN url (the self-declaration branch); %4==3 → no
    // canonical link at all (implicit self). Oracle rebuilds targets
    // from the formulas — a grammar slip, a resolution miss, or a
    // wrong-tag pick changes a cluster count.
    QueryDef("pipeline_canonical_cluster",
      (s, d) => {
        val pageUrl = concat(lit("https://www.Page"), col("doc_id") % 6,
          lit(".co.uk:443/p/"), col("doc_id"))
        val html = when(col("doc_id") % 4 === 0,
            concat(lit("<head><link rel=\"stylesheet\" href=\"/s.css\">" +
              "<link rel=\"canonical\" href=\"https://www.Page"),
              col("doc_id") % 6, lit(".CO.UK/c/"), col("doc_id") % 10,
              lit("#v\"><link rel=\"canonical\" " +
                "href=\"https://evil.example.org/x\"></head>")))
          .when(col("doc_id") % 4 === 1,
            concat(lit("<head><link href='/c/"), col("doc_id") % 10,
              lit("' rel='canonical'></head>")))
          .when(col("doc_id") % 4 === 2,
            concat(lit("<head><link REL=\"Canonical\" " +
              "href=\"https://www.Page"), col("doc_id") % 6,
              lit(".co.uk:443/p/"), col("doc_id"), lit("\"></head>")))
          .otherwise(lit("<head><link rel=\"icon\" " +
            "href=\"/i.png\"></head>"))
        TextOps.canonicalClusters(Tables.documents(s, d)
          .select(col("doc_id"), pageUrl.as("page_url"),
            html.as("text")))
      },
      Some("""WITH t AS (SELECT doc_id,
             |   CASE WHEN doc_id % 4 IN (0, 1)
             |     THEN 'https://www.page' || (doc_id % 6)
             |       || '.co.uk/c/' || (doc_id % 10)
             |     ELSE 'https://www.page' || (doc_id % 6)
             |       || '.co.uk/p/' || doc_id END AS canonical_url,
             |   'page' || (doc_id % 6) || '.co.uk' AS domain,
             |   CASE WHEN doc_id % 4 IN (0, 1) THEN 0 ELSE 1 END
             |     AS self
             |  FROM documents)
             | SELECT canonical_url, domain,
             |  CAST(count(*) AS BIGINT) AS n_pages,
             |  CAST(sum(self) AS BIGINT) AS n_self,
             |  CAST(count(*) - sum(self) AS BIGINT) AS n_dupes
             | FROM t GROUP BY 1, 2
             | ORDER BY canonical_url""".stripMargin.replace("\n", "")),
      presentOrder = Seq("canonical_url")),

    // Robots-meta index policy — the in-page counterpart of
    // robots.txt: fetching was allowed, but the page says what the
    // INDEX may do with it. Fixture per page by %5: plain noindex
    // (plus a viewport distractor the name filter must skip),
    // content-BEFORE-name single-quoted 'NOFOLLOW , x' (token parse
    // under case + spacing + an unknown token), 'none' (= both),
    // no robots meta at all (implicit indexable), and TWO robots
    // metas whose union must combine most-restrictive. Oracle
    // rebuilds the policy bits from the %5 formulas.
    QueryDef("text_meta_robots",
      (s, d) => {
        val pageUrl = concat(lit("https://www.M"), col("doc_id") % 4,
          lit(".ORG/p/"), col("doc_id"))
        val html = when(col("doc_id") % 5 === 0,
            lit("<head><meta name=\"viewport\" content=\"width=1\">" +
              "<meta name=\"robots\" content=\"noindex\"></head>"))
          .when(col("doc_id") % 5 === 1,
            lit("<head><meta content='NOFOLLOW , x' name='Robots'>" +
              "</head>"))
          .when(col("doc_id") % 5 === 2,
            lit("<head><meta name=\"ROBOTS\" content=\"none\"></head>"))
          .when(col("doc_id") % 5 === 3,
            lit("<head><meta name=\"author\" content=\"x\"></head>"))
          .otherwise(
            lit("<head><meta name=\"robots\" content=\"noindex\">" +
              "<meta name=\"robots\" content=\"nofollow\"></head>"))
        TextOps.metaRobots(Tables.documents(s, d)
          .select(col("doc_id"), pageUrl.as("page_url"),
            html.as("text")))
      },
      Some("""WITH t AS (SELECT doc_id,
             |   'm' || (doc_id % 4) || '.org' AS domain,
             |   CASE WHEN doc_id % 5 IN (0, 2, 4) THEN 1 ELSE 0 END
             |     AS ni,
             |   CASE WHEN doc_id % 5 IN (1, 2, 4) THEN 1 ELSE 0 END
             |     AS nf
             |  FROM documents)
             | SELECT domain, CAST(count(*) AS BIGINT) AS n_pages,
             |  CAST(sum(ni) AS BIGINT) AS n_noindex,
             |  CAST(sum(nf) AS BIGINT) AS n_nofollow,
             |  CAST(count(*) - sum(ni) AS BIGINT) AS n_indexable
             | FROM t GROUP BY domain ORDER BY domain""".stripMargin
        .replace("\n", "")),
      presentOrder = Seq("domain")),

    // Politeness fetch schedule — the frontier's output: per-domain
    // serialized fetch slots under Crawl-delay rate limits. The
    // trap domain (500 URLs at 100 ms) and shop0 (250 ms override)
    // exercise the delay join; shop1/shop2 take the 1000 ms default;
    // the median-slot URL witnesses the window ordering. Oracle
    // recomputes the WHOLE pipeline (extract → canonicalize →
    // dedup → delay join → window → roll-up) in SQL over the same
    // fixture table — prose URLs in the real text flow through both
    // engines identically.
    QueryDef("pipeline_crawl_schedule",
      (s, d) => {
        import s.implicits._
        TextOps.crawlSchedule(
          Tables.documents(s, d).select(col("doc_id"),
            crawlUrlFixtureCol),
          CrawlDelays.toDF("domain", "delay_ms"))
      },
      Some(TextOps.crawlScheduleSql(CrawlUrlFixtureTable,
        crawlDelaysValues)),
      presentOrder = Seq("domain")),

    // robots.txt group parser — the PRODUCER of the rule table
    // pipeline_robots_filter consumes (until now hand-supplied; this
    // closes the chain from raw fetched robots bytes). Fixture per
    // file by %5: a star group followed by TWO exact-agent groups
    // that must both apply (merge) while the star group drops; stacked
    // user-agent lines sharing one group; a star-only file (the
    // fallback branch); comments + an EMPTY Disallow (the allow-all
    // idiom — no rule) + an uppercase key + a trailing comment; and a
    // rule BEFORE any group that must drop ahead of a star group.
    // Oracle recomputes the same line scan + window group ids +
    // selection in SQL.
    QueryDef("pipeline_robots_parse",
      (s, d) => TextOps.robotsParse(robotsDocs(s, d)),
      Some(TextOps.robotsParseSql(RobotsBodyTable)),
      presentOrder = Seq("host", "pattern", "allow")),

    // Parse → filter composition, end to end from RAW robots bytes:
    // the rules pipeline_robots_filter consumes come from
    // robotsParse over the body fixture above, and the URL corpus
    // plants one URL per rule class on each doc's OWN host — /g<id%3>z
    // (blocked by the merged exact group on %5==0 hosts), /a/b/c
    // (allowed there: the star group dropped), /ok-ish and /tail and
    // /star<id%4>x hitting the other branches, and /free (no rule
    // anywhere -> implicit allow). Oracle runs the SAME composed
    // chain: robotsFilterSqlFrom(robotsParseSql) — both engines parse
    // the bytes, derive the rules, and filter, with zero hand-typed
    // rule values.
    QueryDef("pipeline_robots_e2e",
      (s, d) => {
        val urls = concat(
          lit("see https://h"), col("doc_id"), lit(".com/g"),
          col("doc_id") % 3, lit("z https://h"), col("doc_id"),
          lit(".com/a/b/c https://h"), col("doc_id"),
          lit(".com/ok https://h"), col("doc_id"),
          lit(".com/tail9 https://h"), col("doc_id"),
          lit(".com/star"), col("doc_id") % 4,
          lit("x https://h"), col("doc_id"), lit(".com/free"))
        TextOps.robotsFilter(
          Tables.documents(s, d).select(col("doc_id"),
            urls.as("text")),
          TextOps.robotsParse(robotsDocs(s, d)))
      },
      Some(TextOps.robotsFilterSqlFrom(
        "(SELECT doc_id," +
          " 'see https://h' || doc_id || '.com/g' || (doc_id % 3) ||" +
          " 'z https://h' || doc_id || '.com/a/b/c' ||" +
          " ' https://h' || doc_id || '.com/ok' ||" +
          " ' https://h' || doc_id || '.com/tail9' ||" +
          " ' https://h' || doc_id || '.com/star' || (doc_id % 4) ||" +
          " 'x https://h' || doc_id || '.com/free' AS text" +
          " FROM documents)",
        s"(${TextOps.robotsParseSql(RobotsBodyTable)})")),
      presentOrder = Seq("doc_id", "url_canon")),

    // Hreflang parallel-page pairs — the multilingual parallel-corpus
    // mining seed: pages declare language variants via <link
    // rel="alternate" hreflang>, and each page's declaration set
    // yields (lang_a, lang_b, url_a, url_b) parallel document pairs.
    // Fixture per page (3 of 4): an absolute en alternate, a
    // single-quoted hreflang-BEFORE-rel uppercase-FR root-relative
    // alternate, a de-AT alternate with mixed-case host + :443 +
    // fragment (all canonical rules), an x-default that must drop,
    // and a stylesheet distractor; the fourth page has none. Pairs
    // per page: (de-at,en), (de-at,fr), (en,fr). Oracle rebuilds the
    // pair table from the formulas — a grammar slip, a dropped
    // x-default, or a resolution miss changes a count.
    QueryDef("pipeline_hreflang_pairs",
      (s, d) => {
        val pageUrl = concat(lit("https://www.L"), col("doc_id") % 4,
          lit(".com/p/"), col("doc_id"))
        val html = when(col("doc_id") % 4 === 3,
            lit("<head><link rel=\"stylesheet\" href=\"/s.css\">" +
              "</head>"))
          .otherwise(concat(
            lit("<head><link rel=\"stylesheet\" href=\"/s.css\">" +
              "<link rel=\"alternate\" hreflang=\"en\" " +
              "href=\"https://www.L"), col("doc_id") % 4,
            lit(".com/en/"), col("doc_id") % 8,
            lit("\"><link hreflang='FR' rel='alternate' href='/fr/"),
            col("doc_id") % 8,
            lit("'><link rel=\"alternate\" hreflang=\"de-AT\" " +
              "href=\"https://www.L"), col("doc_id") % 4,
            lit(".COM:443/de/"), col("doc_id") % 8,
            lit("#x\"><link rel=\"alternate\" " +
              "hreflang=\"x-default\" href=\"/d\"></head>")))
        TextOps.hreflangPairs(Tables.documents(s, d)
          .select(col("doc_id"), pageUrl.as("page_url"),
            html.as("text")))
      },
      Some("""WITH d AS (SELECT doc_id FROM documents
             |   WHERE doc_id % 4 <> 3),
             | e AS (SELECT doc_id,
             |   'https://www.l' || (doc_id % 4) || '.com/de/'
             |     || (doc_id % 8) AS u_de,
             |   'https://www.l' || (doc_id % 4) || '.com/en/'
             |     || (doc_id % 8) AS u_en,
             |   'https://www.l' || (doc_id % 4) || '.com/fr/'
             |     || (doc_id % 8) AS u_fr
             |  FROM d),
             | p AS (
             |  SELECT doc_id, 'de-at' AS lang_a, u_de AS url_a,
             |    'en' AS lang_b, u_en AS url_b FROM e
             |  UNION ALL SELECT doc_id, 'de-at', u_de, 'fr', u_fr
             |  FROM e
             |  UNION ALL SELECT doc_id, 'en', u_en, 'fr', u_fr
             |  FROM e)
             | SELECT lang_a, lang_b,
             |  CAST(count(*) AS BIGINT) AS n_pairs,
             |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_pages,
             |  CAST(count(DISTINCT url_a || '|' || url_b) AS BIGINT)
             |    AS n_unique_pairs,
             |  min(url_a || ' ' || url_b) AS first_pair
             | FROM p GROUP BY 1, 2
             | ORDER BY lang_a, lang_b""".stripMargin.replace("\n", "")),
      presentOrder = Seq("lang_a", "lang_b")),

    // Sitemap discovery from robots.txt — how the crawler FINDS the
    // inventories text_sitemap parses: `Sitemap:` lines (key case-
    // insensitive, leading whitespace legal, multiple lines, absolute
    // URLs required). Fixture per doc (3 of 4 are robots bodies with
    // sitemap lines): a mixed-case-host + :443 value, the SAME url in
    // a second spelling (lowercase key — must collapse after
    // canonicalization), a leading-space `SiteMap:` CDN value, and a
    // relative value that must drop; the fourth doc has no sitemap
    // lines. Oracle recomputes the whole extraction + canonicalize +
    // dedup + roll-up in SQL over the same fixture.
    QueryDef("text_robots_sitemaps",
      (s, d) => {
        val body = when(col("doc_id") % 4 === 3,
            lit("User-agent: *\nAllow: /"))
          .otherwise(concat(
            lit("User-agent: *\nDisallow: /private\n" +
              "Sitemap: https://www.R"), col("doc_id") % 4,
            lit(".COM:443/s/"), col("doc_id") % 6,
            lit(".xml\nsitemap: https://www.r"), col("doc_id") % 4,
            lit(".com/s/"), col("doc_id") % 6,
            lit(".xml\n SiteMap: https://cdn.maps"), col("doc_id") % 2,
            lit(".net/m/"), col("doc_id") % 5,
            lit(".xml\nSitemap: /relative.xml")))
        TextOps.robotsSitemaps(Tables.documents(s, d)
          .select(col("doc_id"), body.as("text")))
      },
      Some(TextOps.robotsSitemapsSql(
        "(SELECT doc_id, CASE WHEN doc_id % 4 = 3" +
          " THEN 'User-agent: *' || chr(10) || 'Allow: /'" +
          " ELSE 'User-agent: *' || chr(10) || 'Disallow: /private'" +
          " || chr(10) || 'Sitemap: https://www.R' || (doc_id % 4)" +
          " || '.COM:443/s/' || (doc_id % 6) || '.xml'" +
          " || chr(10) || 'sitemap: https://www.r' || (doc_id % 4)" +
          " || '.com/s/' || (doc_id % 6) || '.xml'" +
          " || chr(10) || ' SiteMap: https://cdn.maps' || (doc_id % 2)" +
          " || '.net/m/' || (doc_id % 5) || '.xml'" +
          " || chr(10) || 'Sitemap: /relative.xml' END AS text" +
          " FROM documents)")),
      presentOrder = Seq("domain")),

    // Crawler-trap detection — the frontier's self-defense against
    // infinite URL spaces: distinct-URL explosion over a bounded
    // path-template set. The fixture plants both trap classes (path
    // trap /cal/N/N at 500 URLs; query trap /s at ~167 per shop
    // domain) beside a healthy catalog template (/p/N at 5 — under
    // the threshold) so the template-grain threshold separates them.
    // Oracle recomputes the pipeline in SQL.
    QueryDef("pipeline_crawl_traps",
      (s, d) => TextOps.crawlTraps(
        Tables.documents(s, d).select(col("doc_id"),
          crawlUrlFixtureCol), minUrls = 8),
      Some(TextOps.crawlTrapsSql(CrawlUrlFixtureTable, minUrls = 8)),
      presentOrder = Seq("domain"))
  )
}
