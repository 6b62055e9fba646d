Feature: Correlated MERGE with one unbound endpoint (per-row match-else-create)

  Scenario: each bound row creates its own endpoint even with equal keys
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a1', k: 1}), (:A {name: 'a2', k: 1})
      """
    And having executed:
      """
      MATCH (a:A) MERGE (a)-[:R]->(b:B {k: a.k})
      """
    When executing query:
      """
      MATCH (b:B) RETURN count(b) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: re-running the same MERGE creates nothing new
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a1', k: 1}), (:A {name: 'a2', k: 2})
      """
    And having executed:
      """
      MATCH (a:A) MERGE (a)-[:R]->(b:B {k: a.k})
      """
    And having executed:
      """
      MATCH (a:A) MERGE (a)-[:R]->(b:B {k: a.k})
      """
    When executing query:
      """
      MATCH (:A)-[r:R]->(:B) RETURN count(r) AS edges
      """
    Then the result should be, in any order:
      | edges |
      | 2     |

  Scenario: existing node without the edge is not reused
    Given an empty graph
    And having executed:
      """
      CREATE (:Tgt {k: 5})
      """
    And having executed:
      """
      CREATE (:Src {name: 's'})
      """
    And having executed:
      """
      MATCH (s:Src) MERGE (s)-[:E]->(t:Tgt {k: 5})
      """
    When executing query:
      """
      MATCH (t:Tgt) RETURN count(t) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: MERGE binds the created endpoint in the same statement
    Given an empty graph
    And having executed:
      """
      CREATE (:U {name: 'u'})
      """
    When executing query:
      """
      MATCH (u:U) MERGE (u)-[:OWNS]->(w:W {tag: u.name})
      RETURN w.tag AS tag
      """
    Then the result should be, in any order:
      | tag |
      | 'u' |

  Scenario: ON CREATE SET fires for the created pattern
    Given an empty graph
    And having executed:
      """
      CREATE (:U {name: 'u'})
      """
    And having executed:
      """
      MATCH (u:U) MERGE (u)-[r:OWNS]->(w:W {k: 1})
      ON CREATE SET r.new = true, w.src = u.name
      """
    When executing query:
      """
      MATCH (:U)-[r:OWNS]->(w:W) RETURN r.new AS n, w.src AS s
      """
    Then the result should be, in any order:
      | n    | s   |
      | true | 'u' |

  Scenario: ON MATCH SET fires only on the second run
    Given an empty graph
    And having executed:
      """
      CREATE (:U {name: 'u'})
      """
    And having executed:
      """
      MATCH (u:U) MERGE (u)-[r:OWNS]->(w:W {k: 1}) ON MATCH SET r.m = true
      """
    And having executed:
      """
      MATCH (u:U) MERGE (u)-[r:OWNS]->(w:W {k: 1}) ON MATCH SET r.m = true
      """
    When executing query:
      """
      MATCH (:U)-[r:OWNS]->(:W) RETURN r.m AS m, count(*) AS n
      """
    Then the result should be, in any order:
      | m    | n |
      | true | 1 |

  Scenario: incoming direction creates the source side
    Given an empty graph
    And having executed:
      """
      CREATE (:V {name: 'v'})
      """
    And having executed:
      """
      MATCH (v:V) MERGE (v)<-[:IN]-(w:W {tag: v.name})
      """
    When executing query:
      """
      MATCH (w:W)-[:IN]->(v:V) RETURN w.tag AS t, v.name AS n
      """
    Then the result should be, in any order:
      | t   | n   |
      | 'v' | 'v' |

  Scenario: different relationship properties form a different pattern
    Given an empty graph
    And having executed:
      """
      CREATE (:P {name: 'p'})
      """
    And having executed:
      """
      MATCH (p:P) MERGE (p)-[:L {w: 1}]->(q:Q {k: 1})
      """
    And having executed:
      """
      MATCH (p:P) MERGE (p)-[:L {w: 2}]->(q:Q {k: 1})
      """
    When executing query:
      """
      MATCH (:P)-[l:L]->(:Q) RETURN count(l) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |

  Scenario: merging with a null key property raises
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'x'})
      """
    When executing query:
      """
      MATCH (a:A) MERGE (a)-[:R]->(b:B {k: a.missing})
      """
    Then an error should be raised

  Scenario: duplicate bound rows share one created endpoint
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})
      """
    And having executed:
      """
      MATCH (a:A) UNWIND [1, 2] AS i MERGE (a)-[:R]->(b:B {k: a.k})
      """
    When executing query:
      """
      MATCH (b:B) RETURN count(b) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: correlated key follows each row's property
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 10}), (:A {k: 20})
      """
    And having executed:
      """
      MATCH (a:A) MERGE (a)-[:R]->(b:B {k: a.k})
      """
    When executing query:
      """
      MATCH (a:A)-[:R]->(b:B) RETURN a.k AS ak, b.k AS bk ORDER BY ak
      """
    Then the result should be, in order:
      | ak | bk |
      | 10 | 10 |
      | 20 | 20 |

  Scenario: unbound endpoint without key props merges on edge existence
    Given an empty graph
    And having executed:
      """
      CREATE (:A {name: 'a'})
      """
    And having executed:
      """
      MATCH (a:A) MERGE (a)-[:R]->(b:B)
      """
    And having executed:
      """
      MATCH (a:A) MERGE (a)-[:R]->(b:B)
      """
    When executing query:
      """
      MATCH (:A)-[r:R]->(:B) RETURN count(r) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: merged endpoints visible to later statements
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 7})
      """
    And having executed:
      """
      MATCH (a:A) MERGE (a)-[:R]->(b:B {k: a.k})
      """
    And having executed:
      """
      MATCH (b:B) SET b.touched = true
      """
    When executing query:
      """
      MATCH (b:B) RETURN b.k AS k, b.touched AS t
      """
    Then the result should be, in any order:
      | k | t    |
      | 7 | true |

  Scenario: unlabeled bound endpoint merges an unbound node per row
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1}), (:B {k: 2})
      """
    And having executed:
      """
      MATCH (n) MERGE (n)-[:OWNS]->(c:Cart {of: n.k})
      """
    When executing query:
      """
      MATCH (n)-[:OWNS]->(c:Cart)
      RETURN n.k AS k, c.of AS of ORDER BY k
      """
    Then the result should be, in order:
      | k | of |
      | 1 | 1  |
      | 2 | 2  |

  Scenario: unlabeled bound endpoint MERGE is idempotent
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1}), (:B {k: 2})
      """
    And having executed:
      """
      MATCH (n) WHERE n.k IS NOT NULL MERGE (n)-[:OWNS]->(c:Cart {of: n.k})
      """
    And having executed:
      """
      MATCH (n) WHERE n.k IS NOT NULL MERGE (n)-[:OWNS]->(c:Cart {of: n.k})
      """
    When executing query:
      """
      MATCH (c:Cart) RETURN count(c) AS carts
      """
    Then the result should be, in any order:
      | carts |
      | 2     |

  Scenario: multi-label bound endpoint merges an unbound node
    Given an empty graph
    And having executed:
      """
      CREATE (n:A:V {k: 5})
      """
    And having executed:
      """
      MATCH (a:A:V) MERGE (a)-[:R]->(b:B {k: a.k})
      """
    When executing query:
      """
      MATCH (:A)-[:R]->(b:B) RETURN b.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 5 |

  Scenario: ON CREATE SET on the unbound node is visible to RETURN
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})
      """
    When executing query:
      """
      MATCH (a:A)
      MERGE (a)-[r:R]->(b:B {k: a.k})
      ON CREATE SET b.made = true, r.w = 5
      RETURN b.k AS k, b.made AS made, r.w AS w
      """
    Then the result should be, in any order:
      | k | made | w |
      | 1 | true | 5 |

  Scenario: ON MATCH SET on the far node reads outer variables and rebinds
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 3})-[:R {w: 1}]->(:B {k: 3})
      """
    When executing query:
      """
      MATCH (a:A)
      MERGE (a)-[r:R]->(b:B)
      ON MATCH SET b.seen = a.k
      RETURN r.w AS w, b.seen AS seen
      """
    Then the result should be, in any order:
      | w | seen |
      | 1 | 3    |
