Feature: Graph function matrix — type, labels, startNode, endNode, id, properties

  Scenario: type of a matched relationship
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:KNOWS]->(:B)
      """
    When executing query:
      """
      MATCH ()-[r]->() RETURN type(r) AS t
      """
    Then the result should be, in any order:
      | t       |
      | 'KNOWS' |

  Scenario: labels returns the sorted full label set
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})
      """
    And having executed:
      """
      MATCH (a:A) SET a:Z
      """
    When executing query:
      """
      MATCH (a:A) RETURN labels(a) AS ls
      """
    Then the result should be, in any order:
      | ls         |
      | ['A', 'Z'] |

  Scenario: startNode and endNode give the oriented endpoints
    Given an empty graph
    And having executed:
      """
      CREATE (:S {k: 1})-[:R]->(:T {k: 2})
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN startNode(r).k AS s, endNode(r).k AS e
      """
    Then the result should be, in any order:
      | s | e |
      | 1 | 2 |

  Scenario: startNode endNode ignore the match direction
    Given an empty graph
    And having executed:
      """
      CREATE (:S {k: 1})-[:R]->(:T {k: 2})
      """
    When executing query:
      """
      MATCH (t:T)<-[r:R]-(s:S) RETURN startNode(r).k AS s, endNode(r).k AS e
      """
    Then the result should be, in any order:
      | s | e |
      | 1 | 2 |

  Scenario: id is stable within a statement
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})
      """
    When executing query:
      """
      MATCH (a:A) MATCH (b:A) WHERE id(a) = id(b) RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |

  Scenario: graph functions of null entities are null
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (a)-[r:NOPE]->(x)
      RETURN type(r) AS t, labels(x) AS l, id(x) AS i, properties(x) AS p
      """
    Then the result should be, in any order:
      | t    | l    | i    | p    |
      | null | null | null | null |

  Scenario: properties returns only set properties
    Given an empty graph
    And having executed:
      """
      CREATE (:A {k: 1, name: 'x'})
      """
    When executing query:
      """
      MATCH (a:A) RETURN properties(a) AS p
      """
    Then the result should be, in any order:
      | p                 |
      | {k: 1, name: 'x'} |

  Scenario: keys of a node lists its property names
    Given an empty graph
    And having executed:
      """
      CREATE (:A {b: 2, a: 1})
      """
    When executing query:
      """
      MATCH (n:A) UNWIND keys(n) AS k RETURN k ORDER BY k
      """
    Then the result should be, in order:
      | k   |
      | 'a' |
      | 'b' |

  Scenario: relationship properties via properties()
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:R {w: 5, tag: 'x'}]->(:B)
      """
    When executing query:
      """
      MATCH ()-[r:R]->() RETURN properties(r) AS p
      """
    Then the result should be, in any order:
      | p                |
      | {w: 5, tag: 'x'} |

  Scenario: type inside an aggregation groups per type
    Given an empty graph
    And having executed:
      """
      CREATE (:A)-[:X]->(:B), (:A)-[:X]->(:B), (:A)-[:Y]->(:B)
      """
    When executing query:
      """
      MATCH ()-[r]->() RETURN type(r) AS t, count(*) AS n ORDER BY t
      """
    Then the result should be, in order:
      | t   | n |
      | 'X' | 2 |
      | 'Y' | 1 |

  Scenario: coalesce over entity properties
    Given an empty graph
    And having executed:
      """
      CREATE (:A {nick: 'n'}), (:A {name: 'm'})
      """
    When executing query:
      """
      MATCH (a:A) RETURN coalesce(a.nick, a.name, '?') AS v ORDER BY v
      """
    Then the result should be, in order:
      | v   |
      | 'm' |
      | 'n' |

  Scenario: exists property predicate via IS NOT NULL
    Given an empty graph
    And having executed:
      """
      CREATE (:A {opt: 1}), (:A)
      """
    When executing query:
      """
      MATCH (a:A) WHERE a.opt IS NOT NULL RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n |
      | 1 |
