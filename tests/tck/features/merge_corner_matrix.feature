Feature: MERGE corner matrix — repeated variables, undirected chains, multi-label nodes

  # Round-7 lifts of the remaining correlated-MERGE corners (reference merge
  # interpreters src/executor.ts:6835-7121; bound-variable predicate
  # rejection src/translator.ts:305-333). Semantics target Neo4j 3.5:
  # - an unbound pattern variable may repeat inside one MERGE pattern
  #   (every occurrence is the SAME node); later occurrences must be bare
  # - a bound variable reused in MERGE must be bare, else SyntaxError
  # - undirected MERGE hops match either orientation, create left-to-right
  # - multi-label MERGE nodes match on label intersection, create with all

  # ---- multi-label unbound MERGE node -----------------------------------

  Scenario: multi-label MERGE creates a node carrying every label
    Given an empty graph
    And having executed:
      """
      MERGE (n:MA:MB {k: 1})
      """
    When executing query:
      """
      MATCH (n:MB) RETURN labels(n) AS l, n.k AS k
      """
    Then the result should be, in any order:
      | l            | k |
      | ['MA', 'MB'] | 1 |

  Scenario: multi-label MERGE does not match a partial-label node
    Given an empty graph
    And having executed:
      """
      CREATE (:MA {k: 1})
      """
    And having executed:
      """
      MERGE (n:MA:MB {k: 1})
      """
    When executing query:
      """
      MATCH (n:MA) RETURN count(n) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: multi-label MERGE matches an existing full-label node
    Given an empty graph
    And having executed:
      """
      CREATE (n:MA {k: 1}) SET n:MB
      """
    And having executed:
      """
      MERGE (n:MA:MB {k: 1})
      """
    When executing query:
      """
      MATCH (n:MA) RETURN count(n) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: multi-label MERGE matches regardless of label declaration order
    Given an empty graph
    And having executed:
      """
      MERGE (n:MA:MB {k: 1})
      """
    And having executed:
      """
      MERGE (n:MB:MA {k: 1})
      """
    When executing query:
      """
      MATCH (n:MA:MB) RETURN count(n) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: multi-label MERGE ON CREATE and ON MATCH
    Given an empty graph
    And having executed:
      """
      MERGE (n:MA:MB {k: 1}) ON CREATE SET n.tag = 'new'
      """
    And having executed:
      """
      MERGE (n:MA:MB {k: 1}) ON MATCH SET n.tag = 'old'
      """
    When executing query:
      """
      MATCH (n:MA:MB) RETURN n.tag AS tag
      """
    Then the result should be, in any order:
      | tag   |
      | 'old' |

  Scenario: correlated MERGE with a multi-label unbound endpoint
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {k: 1}), (:Seed {k: 2})
      """
    And having executed:
      """
      MATCH (x:Seed) MERGE (x)-[:T]->(m:MA:MB {k: x.k})
      """
    And having executed:
      """
      MATCH (x:Seed) MERGE (x)-[:T]->(m:MA:MB {k: x.k})
      """
    When executing query:
      """
      MATCH (:Seed)-[:T]->(m:MA:MB) RETURN count(m) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  # ---- repeated unbound variable (same node at every occurrence) --------

  Scenario: correlated multi-hop MERGE cycle through a repeated variable
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {k: 1}), (:Seed {k: 2})
      """
    And having executed:
      """
      MATCH (x:Seed) MERGE (a:P {k: x.k})-[:X]->(c:Q {k: x.k})-[:Y]->(a)
      """
    When executing query:
      """
      MATCH (a:P)-[:X]->(:Q)-[:Y]->(a2:P)
      RETURN count(*) AS paths, count(CASE WHEN id(a) = id(a2) THEN 1 END) AS closed
      """
    Then the result should be, in any order:
      | paths | closed |
      | 2     | 2      |

  Scenario: repeated-variable MERGE is idempotent
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {k: 1}), (:Seed {k: 2})
      """
    And having executed:
      """
      MATCH (x:Seed) MERGE (a:P {k: x.k})-[:X]->(c:Q {k: x.k})-[:Y]->(a)
      """
    And having executed:
      """
      MATCH (x:Seed) MERGE (a:P {k: x.k})-[:X]->(c:Q {k: x.k})-[:Y]->(a)
      """
    When executing query:
      """
      MATCH (n:P) WITH count(n) AS p MATCH (m:Q) RETURN p, count(m) AS q
      """
    Then the result should be, in any order:
      | p | q |
      | 2 | 2 |

  Scenario: correlated self-loop MERGE binds one node per key
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {k: 1}), (:Seed {k: 2})
      """
    And having executed:
      """
      MATCH (x:Seed) MERGE (s:L {k: x.k})-[:SELF]->(s)
      """
    And having executed:
      """
      MATCH (x:Seed) MERGE (s:L {k: x.k})-[:SELF]->(s)
      """
    When executing query:
      """
      MATCH (s:L)-[:SELF]->(s2:L) WHERE id(s) = id(s2)
      RETURN count(*) AS loops
      """
    Then the result should be, in any order:
      | loops |
      | 2     |

  # ---- undirected correlated multi-hop ----------------------------------

  Scenario: undirected hop in correlated multi-hop MERGE creates left-to-right
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {k: 1}), (:Seed {k: 2})
      """
    And having executed:
      """
      MATCH (x:Seed) MERGE (x)-[:UX]-(b:U {k: x.k})-[:UY]->(c:V {k: x.k})
      """
    When executing query:
      """
      MATCH (x:Seed)-[:UX]->(b:U)-[:UY]->(c:V) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: undirected hop in correlated multi-hop MERGE matches either orientation
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {k: 1}), (:Seed {k: 2})
      """
    And having executed:
      """
      MATCH (x:Seed) CREATE (b:U {k: x.k})-[:UX]->(x), (b)-[:UY]->(:V {k: x.k})
      """
    And having executed:
      """
      MATCH (x:Seed) MERGE (x)-[:UX]-(b:U {k: x.k})-[:UY]->(c:V {k: x.k})
      """
    When executing query:
      """
      MATCH (b:U) WITH count(b) AS us MATCH ()-[r:UX]->() RETURN us, count(r) AS xs
      """
    Then the result should be, in any order:
      | us | xs |
      | 2  | 2  |

  # ---- bound-variable predicate rejection (Neo4j 3.5 parity) ------------

  Scenario: MERGE rejects a label predicate on a bound endpoint
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {k: 1})
      """
    When executing query:
      """
      MATCH (x:Seed) MERGE (x:Seed)-[:T]->(b:W {k: 1})
      """
    Then an error should be raised

  Scenario: MERGE rejects a property predicate on a bound endpoint
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {k: 1})
      """
    When executing query:
      """
      MATCH (x:Seed) MERGE (x {k: 1})-[:T]->(b:W {k: 1})
      """
    Then an error should be raised

  Scenario: MERGE rejects predicates on a bound middle node in a chain
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {k: 1})
      """
    When executing query:
      """
      MATCH (x:Seed) MERGE (a:W {k: 1})-[:T]->(x:Seed)-[:T2]->(b:W2 {k: 1})
      """
    Then an error should be raised

  Scenario: MERGE rejects re-stated properties on a repeated unbound variable
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {k: 1})
      """
    When executing query:
      """
      MATCH (x:Seed) MERGE (a:P {k: 1})-[:X]->(:Q {k: 1})-[:Y]->(a {k: 1})
      """
    Then an error should be raised

  Scenario: multi-type relationship MERGE is rejected in a chain
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {k: 1})
      """
    When executing query:
      """
      MATCH (x:Seed) MERGE (x)-[:A|B]->(b:W {k: 1})-[:C]->(c:W2 {k: 1})
      """
    Then an error should be raised

  # ---- additional corner interactions ------------------------------------

  Scenario: both-unbound correlated MERGE with a multi-label endpoint
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {k: 1}), (:Seed {k: 2})
      """
    And having executed:
      """
      MATCH (x:Seed) WITH x.k AS kk MERGE (a:MA:MB {k: kk})-[:T2]->(b:W {k: kk})
      """
    And having executed:
      """
      MATCH (x:Seed) WITH x.k AS kk MERGE (a:MA:MB {k: kk})-[:T2]->(b:W {k: kk})
      """
    When executing query:
      """
      MATCH (a:MA:MB)-[:T2]->(b:W) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: ON MATCH fires when an undirected chain re-merges
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {k: 1})
      """
    And having executed:
      """
      MATCH (x:Seed) MERGE (x)-[r:UX]-(b:U {k: x.k})-[:UY]->(c:V {k: x.k})
      ON CREATE SET r.src = 'create'
      """
    And having executed:
      """
      MATCH (x:Seed) MERGE (x)-[r:UX]-(b:U {k: x.k})-[:UY]->(c:V {k: x.k})
      ON MATCH SET r.src = 'match'
      """
    When executing query:
      """
      MATCH ()-[r:UX]-() RETURN DISTINCT r.src AS src
      """
    Then the result should be, in any order:
      | src     |
      | 'match' |

  Scenario: repeated bound variable closes a chain onto itself
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {k: 1}), (:Seed {k: 2})
      """
    And having executed:
      """
      MATCH (x:Seed) MERGE (x)-[:RB1]->(m:RBM {k: x.k})-[:RB2]->(x)
      """
    And having executed:
      """
      MATCH (x:Seed) MERGE (x)-[:RB1]->(m:RBM {k: x.k})-[:RB2]->(x)
      """
    When executing query:
      """
      MATCH (x:Seed)-[:RB1]->(m:RBM)-[:RB2]->(y:Seed)
      RETURN count(*) AS paths, count(CASE WHEN id(x) = id(y) THEN 1 END) AS closed
      """
    Then the result should be, in any order:
      | paths | closed |
      | 2     | 2      |

  Scenario: standalone undirected multi-hop MERGE creates left-to-right once
    Given an empty graph
    And having executed:
      """
      MERGE (a:SA {k: 1})-[:SX]-(b:SB {k: 2})-[:SY]-(c:SC {k: 3})
      """
    And having executed:
      """
      MERGE (a:SA {k: 1})-[:SX]-(b:SB {k: 2})-[:SY]-(c:SC {k: 3})
      """
    When executing query:
      """
      MATCH (a:SA)-[:SX]->(b:SB)-[:SY]->(c:SC) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |
