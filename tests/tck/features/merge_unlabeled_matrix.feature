Feature: Unlabeled and keyless MERGE — openCypher Merge1 forms

  # Round-7: MERGE (a), MERGE (a {k: 1}), MERGE (a:L) and unlabeled
  # relationship-MERGE endpoints (openCypher Merge1/Merge5 forms the
  # reference certifies, test/tck/neo4j35-baseline.ts). An unlabeled MERGE
  # matches ANY node (any label) by its key props; creation yields an
  # unlabeled node. A keyless MERGE matches every node of its label set
  # and creates one bare node only when nothing matches.

  Scenario: keyless unlabeled MERGE creates one node on an empty graph
    Given an empty graph
    And having executed:
      """
      MERGE (a)
      """
    And having executed:
      """
      MERGE (a)
      """
    When executing query:
      """
      MATCH (n) RETURN count(*) AS c, labels(n) AS l
      """
    Then the result should be, in any order:
      | c | l  |
      | 1 | [] |

  Scenario: keyless unlabeled MERGE matches every existing node
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1}), ({k: 2})
      """
    When executing query:
      """
      MERGE (a) RETURN a.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |
      | 2 |

  Scenario: unlabeled keyed MERGE matches a labeled node
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 2})
      """
    And having executed:
      """
      MERGE (a {k: 2})
      """
    When executing query:
      """
      MATCH (n) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: unlabeled keyed MERGE creates an unlabeled node when nothing matches
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 2})
      """
    And having executed:
      """
      MERGE (a {k: 9})
      """
    When executing query:
      """
      MATCH (n) WHERE n.k = 9 RETURN labels(n) AS l
      """
    Then the result should be, in any order:
      | l  |
      | [] |

  Scenario: unlabeled keyed MERGE ON CREATE and ON MATCH
    Given an empty graph
    And having executed:
      """
      MERGE (a {k: 1}) ON CREATE SET a.tag = 'new'
      """
    And having executed:
      """
      MERGE (a {k: 1}) ON MATCH SET a.tag = 'old'
      """
    When executing query:
      """
      MATCH (n) RETURN n.tag AS tag
      """
    Then the result should be, in any order:
      | tag   |
      | 'old' |

  Scenario: keyless labeled MERGE creates then matches
    Given an empty graph
    And having executed:
      """
      MERGE (a:L)
      """
    And having executed:
      """
      MERGE (a:L)
      """
    When executing query:
      """
      MATCH (n:L) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |

  Scenario: keyless labeled MERGE matches every node of the label
    Given an empty graph
    And having executed:
      """
      CREATE (:L {k: 1}), (:L {k: 2}), (:Other {k: 3})
      """
    When executing query:
      """
      MERGE (a:L) RETURN a.k AS k
      """
    Then the result should be, in any order:
      | k |
      | 1 |
      | 2 |

  Scenario: correlated MERGE with a bare unbound endpoint is idempotent
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {k: 1}), (:Seed {k: 2})
      """
    And having executed:
      """
      MATCH (x:Seed) MERGE (x)-[:T]->(b)
      """
    And having executed:
      """
      MATCH (x:Seed) MERGE (x)-[:T]->(b)
      """
    When executing query:
      """
      MATCH (:Seed)-[:T]->(b) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: correlated MERGE with an unlabeled keyed endpoint
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {k: 1}), (:Seed {k: 2})
      """
    And having executed:
      """
      MATCH (x:Seed) MERGE (x)-[:U]->(b {k: x.k})
      """
    And having executed:
      """
      MATCH (x:Seed) MERGE (x)-[:U]->(b {k: x.k})
      """
    When executing query:
      """
      MATCH (:Seed)-[:U]->(b) RETURN b.k AS k, labels(b) AS l
      """
    Then the result should be, in any order:
      | k | l  |
      | 1 | [] |
      | 2 | [] |

  Scenario: both-unbound unlabeled MERGE under rows is idempotent
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {k: 1})
      """
    And having executed:
      """
      MATCH (x:Seed) WITH x.k AS kk MERGE (p {pk: kk})-[:V]->(q {qk: kk})
      """
    And having executed:
      """
      MATCH (x:Seed) WITH x.k AS kk MERGE (p {pk: kk})-[:V]->(q {qk: kk})
      """
    When executing query:
      """
      MATCH (p)-[:V]->(q) RETURN p.pk AS pk, q.qk AS qk
      """
    Then the result should be, in any order:
      | pk | qk |
      | 1  | 1  |

  Scenario: unlabeled-endpoint edges stay matchable in a mixed-label catalog
    Given an empty graph
    And having executed:
      """
      CREATE (:Seed {k: 0})
      """
    And having executed:
      """
      CREATE ({k: 1})-[:R]->({k: 2})
      """
    When executing query:
      """
      MATCH (a)-[:R]->(b) RETURN a.k AS ak, b.k AS bk
      """
    Then the result should be, in any order:
      | ak | bk |
      | 1  | 2  |

  Scenario: standalone unlabeled relationship MERGE is idempotent
    Given an empty graph
    And having executed:
      """
      MERGE (a)-[:W]->(b)
      """
    And having executed:
      """
      MERGE (a)-[:W]->(b)
      """
    When executing query:
      """
      MATCH (a)-[:W]->(b) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 1 |
