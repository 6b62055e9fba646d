Feature: Named path binding across shapes (reference Match6)

  Scenario: Single-node path binds with length zero
    Given an empty graph
    And having executed:
      """
      CREATE (:P1 {n: 'a'})
      """
    When executing query:
      """
      MATCH p = (x:P1 {n: 'a'}) RETURN length(p) AS l, size(nodes(p)) AS n
      """
    Then the result should be, in any order:
      | l | n |
      | 0 | 1 |

  Scenario: Unmatched optional path is null
    Given an empty graph
    And having executed:
      """
      CREATE (:P1 {n: 'a'})
      """
    When executing query:
      """
      OPTIONAL MATCH p = (x:P1 {n: 'zz'})-[:R]->() RETURN p, length(p) AS l
      """
    Then the result should be, in any order:
      | p    | l    |
      | null | null |

  Scenario: Counting paths counts matches not nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:P1 {n: 'a'})-[:R]->(:P1 {n: 'b'})-[:R]->(:P1 {n: 'c'})
      """
    When executing query:
      """
      MATCH p = (x:P1)-[:R]->() RETURN count(p) AS c
      """
    Then the result should be, in any order:
      | c |
      | 2 |

  Scenario: Two named paths in one MATCH share bound nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:P1 {n: 'a'})-[:R]->(:P1 {n: 'b'})-[:R]->(:P1 {n: 'c'})
      """
    When executing query:
      """
      MATCH p = (a:P1 {n: 'a'})-[:R]->(b), q = (b)-[:R]->(c)
      RETURN length(p) + length(q) AS total, c.n AS cn
      """
    Then the result should be, in any order:
      | total | cn  |
      | 2     | 'c' |

  Scenario: Undirected single-hop named path
    Given an empty graph
    And having executed:
      """
      CREATE (:P1 {n: 'a'})-[:R]->(:P1 {n: 'b'})
      """
    When executing query:
      """
      MATCH p = (a:P1 {n: 'a'})-[:R]-(b) RETURN length(p) AS l, b.n AS bn
      """
    Then the result should be, in any order:
      | l | bn  |
      | 1 | 'b' |

  Scenario: Zero-or-one hop path lengths
    Given an empty graph
    And having executed:
      """
      CREATE (:P1 {n: 'a'})-[:R]->(:P1 {n: 'b'})
      """
    When executing query:
      """
      MATCH p = (a:P1 {n: 'a'})-[*0..1]->(x) RETURN length(p) AS l ORDER BY l
      """
    Then the result should be, in order:
      | l |
      | 0 |
      | 1 |

  Scenario: Path survives a WITH boundary
    Given an empty graph
    And having executed:
      """
      CREATE (:P1 {n: 'a'})-[:R]->(:P1 {n: 'b'})
      """
    When executing query:
      """
      MATCH p = (a:P1 {n: 'a'})-[:R]->(b)
      WITH p
      RETURN nodes(p)[0] = nodes(p)[1] AS selfeq, length(p) AS l
      """
    Then the result should be, in any order:
      | selfeq | l |
      | false  | 1 |

  Scenario: Relationship order along a two-hop named path
    Given an empty graph
    And having executed:
      """
      CREATE (:P1 {n: 'a'})-[:R {w: 1}]->(:P1 {n: 'b'})-[:R {w: 2}]->(:P1 {n: 'c'})
      """
    When executing query:
      """
      MATCH p = (a:P1 {n: 'a'})-[:R]->(b)-[:R]->(c)
      RETURN [r IN relationships(p) | r.w] AS ws
      """
    Then the result should be, in order:
      | ws     |
      | [1, 2] |

  Scenario: Path length equals relationship count for var-length matches
    Given an empty graph
    And having executed:
      """
      CREATE (:P1 {n: 'a'})-[:R]->(:P1 {n: 'b'})-[:R]->(:P1 {n: 'c'})
      """
    When executing query:
      """
      MATCH p = (:P1 {n: 'a'})-[*1..2]->(x)
      RETURN length(p) AS l, size(relationships(p)) AS r, size(nodes(p)) AS n ORDER BY l
      """
    Then the result should be, in order:
      | l | r | n |
      | 1 | 1 | 2 |
      | 2 | 2 | 3 |
