Feature: Writes driven by UNWIND over path elements and collected entities

  Scenario: SET over nodes of a static named path
    Given an empty graph
    And having executed:
      """
      CREATE (:S {name: 'a'})-[:R]->(:S {name: 'b'})-[:R]->(:S {name: 'c'})
      """
    And having executed:
      """
      MATCH p = (x:S {name: 'a'})-[:R]->(y:S)
      UNWIND nodes(p) AS n
      SET n.seen = true
      """
    When executing query:
      """
      MATCH (s:S) RETURN s.name AS name, s.seen AS seen ORDER BY name
      """
    Then the result should be, in order:
      | name | seen |
      | 'a'  | true |
      | 'b'  | true |
      | 'c'  | null |

  Scenario: SET over relationships of a var-length path
    Given an empty graph
    And having executed:
      """
      CREATE (:S {name: 'a'})-[:R {w: 1}]->(:S {name: 'b'})-[:R {w: 2}]->(:S {name: 'c'})
      """
    And having executed:
      """
      MATCH p = (:S {name: 'a'})-[:R*1..2]->(:S {name: 'c'})
      UNWIND relationships(p) AS r
      SET r.w = r.w + 10
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN r.w AS w ORDER BY w
      """
    Then the result should be, in order:
      | w  |
      | 11 |
      | 12 |

  Scenario: SET over an unwound collected node list
    Given an empty graph
    And having executed:
      """
      CREATE (:T {k: 1}), (:T {k: 2}), (:T {k: 3})
      """
    And having executed:
      """
      MATCH (t:T) WHERE t.k < 3
      WITH collect(t) AS ts
      UNWIND ts AS t
      SET t.low = true
      """
    When executing query:
      """
      MATCH (t:T) RETURN t.k AS k, t.low AS low ORDER BY k
      """
    Then the result should be, in order:
      | k | low  |
      | 1 | true |
      | 2 | true |
      | 3 | null |

  Scenario: DELETE an unwound collected relationship list
    Given an empty graph
    And having executed:
      """
      CREATE (a:T {k: 1})-[:R {w: 1}]->(b:T {k: 2}),
             (b)-[:R {w: 9}]->(a)
      """
    And having executed:
      """
      MATCH ()-[r:R]->() WHERE r.w > 5
      WITH collect(r) AS rs
      UNWIND rs AS r
      DELETE r
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN count(*) AS n, sum(r.w) AS total
      """
    Then the result should be, in any order:
      | n | total |
      | 1 | 1     |

  Scenario: DETACH DELETE nodes unwound from a collected list
    Given an empty graph
    And having executed:
      """
      CREATE (:T {k: 1})-[:R]->(:T {k: 2})-[:R]->(:T {k: 3})
      """
    And having executed:
      """
      MATCH (t:T) WHERE t.k >= 2
      WITH collect(t) AS ts
      UNWIND ts AS t
      DETACH DELETE t
      """
    When executing query:
      """
      MATCH (t:T) RETURN t.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |

  Scenario: property values read from unwound path nodes drive CREATE
    Given an empty graph
    And having executed:
      """
      CREATE (:S {name: 'a'})-[:R]->(:S {name: 'b'})
      """
    And having executed:
      """
      MATCH p = (:S {name: 'a'})-[:R]->(:S)
      UNWIND nodes(p) AS n
      CREATE (:Copy {orig: n.name})
      """
    When executing query:
      """
      MATCH (c:Copy) RETURN c.orig AS orig ORDER BY orig
      """
    Then the result should be, in order:
      | orig |
      | 'a'  |
      | 'b'  |

  Scenario: MERGE keyed by unwound path node properties is idempotent
    Given an empty graph
    And having executed:
      """
      CREATE (:S {name: 'a'})-[:R]->(:S {name: 'b'})-[:R]->(:S {name: 'a2'})
      """
    And having executed:
      """
      MATCH p = (:S {name: 'a'})-[:R*1..2]->(:S)
      UNWIND nodes(p) AS n
      MERGE (m:Initial {c: left(n.name, 1)})
      """
    When executing query:
      """
      MATCH (m:Initial) RETURN m.c AS c ORDER BY c
      """
    Then the result should be, in order:
      | c   |
      | 'a' |
      | 'b' |

  Scenario: REMOVE over unwound collected nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:T {k: 1, tmp: 'x'}), (:T {k: 2, tmp: 'y'})
      """
    And having executed:
      """
      MATCH (t:T) WITH collect(t) AS ts
      UNWIND ts AS t
      REMOVE t.tmp
      """
    When executing query:
      """
      MATCH (t:T) RETURN t.k AS k, t.tmp AS tmp ORDER BY k
      """
    Then the result should be, in order:
      | k | tmp  |
      | 1 | null |
      | 2 | null |

  Scenario: writes through doubly-unwound nested collected lists
    Given an empty graph
    And having executed:
      """
      CREATE (:G {grp: 1, v: 1}), (:G {grp: 1, v: 2}), (:G {grp: 2, v: 3})
      """
    And having executed:
      """
      MATCH (g:G) WITH g.grp AS grp, collect(g) AS gs
      WITH collect(gs) AS groups
      UNWIND groups AS gs
      UNWIND gs AS g
      SET g.touched = true
      """
    When executing query:
      """
      MATCH (g:G) RETURN count(*) AS n, sum(CASE WHEN g.touched THEN 1 ELSE 0 END) AS touched
      """
    Then the result should be, in any order:
      | n | touched |
      | 3 | 3       |

  Scenario: SET on path nodes then read through the same query
    Given an empty graph
    And having executed:
      """
      CREATE (:S {name: 'a'})-[:R]->(:S {name: 'b'})
      """
    When executing query:
      """
      MATCH p = (x:S {name: 'a'})-[:R]->(y:S)
      UNWIND nodes(p) AS n
      SET n.mark = n.name + '!'
      RETURN n.mark AS mark ORDER BY mark
      """
    Then the result should be, in order:
      | mark |
      | 'a!' |
      | 'b!' |
