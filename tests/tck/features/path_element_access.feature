Feature: Property access on var-length path elements

  Background graph is a chain a-1->b-2->c-3->d with node values 1..4.

  Scenario: Comprehension over nodes of a var-length path reads properties
    Given an empty graph
    And having executed:
      """
      CREATE (:N {n: 'a', v: 1})-[:R {w: 1}]->(:N {n: 'b', v: 2})-[:R {w: 2}]->(:N {n: 'c', v: 3})
      """
    When executing query:
      """
      MATCH p = (:N {n: 'a'})-[*2]->(:N)
      RETURN [n IN nodes(p) | n.n] AS ns
      """
    Then the result should be, in any order:
      | ns              |
      | ['a', 'b', 'c'] |

  Scenario: Comprehension over a var-length relationship list reads properties
    Given an empty graph
    And having executed:
      """
      CREATE (:N {n: 'a'})-[:R {w: 1}]->(:N {n: 'b'})-[:R {w: 2}]->(:N {n: 'c'})-[:R {w: 3}]->(:N {n: 'd'})
      """
    When executing query:
      """
      MATCH (:N {n: 'a'})-[rs:R*1..3]->(x)
      RETURN x.n AS xn, [r IN rs | r.w] AS ws ORDER BY xn
      """
    Then the result should be, in order:
      | xn  | ws        |
      | 'b' | [1]       |
      | 'c' | [1, 2]    |
      | 'd' | [1, 2, 3] |

  Scenario: Filtered comprehension over path nodes
    Given an empty graph
    And having executed:
      """
      CREATE (:N {n: 'a', v: 1})-[:R]->(:N {n: 'b', v: 2})-[:R]->(:N {n: 'c', v: 3})
      """
    When executing query:
      """
      MATCH p = (:N {n: 'a'})-[*2]->(:N)
      RETURN [n IN nodes(p) WHERE n.v > 1 | n.n] AS ns
      """
    Then the result should be, in any order:
      | ns         |
      | ['b', 'c'] |

  Scenario: Quantifier over path nodes with a property predicate
    Given an empty graph
    And having executed:
      """
      CREATE (:N {n: 'a', v: 1})-[:R]->(:N {n: 'b', v: 2})-[:R]->(:N {n: 'c', v: 3})-[:R]->(:N {n: 'd', v: 4})
      """
    When executing query:
      """
      MATCH p = (:N {n: 'a'})-[*1..3]->(x)
      WHERE all(n IN nodes(p) WHERE n.v < 4)
      RETURN x.n AS xn ORDER BY xn
      """
    Then the result should be, in order:
      | xn  |
      | 'b' |
      | 'c' |

  Scenario: Quantifier over var-length relationships
    Given an empty graph
    And having executed:
      """
      CREATE (:N {n: 'a'})-[:R {w: 1}]->(:N {n: 'b'})-[:R {w: 2}]->(:N {n: 'c'})-[:R {w: 9}]->(:N {n: 'd'})
      """
    When executing query:
      """
      MATCH (:N {n: 'a'})-[rs:R*1..3]->(x)
      WHERE all(r IN rs WHERE r.w < 5)
      RETURN x.n AS xn ORDER BY xn
      """
    Then the result should be, in order:
      | xn  |
      | 'b' |
      | 'c' |

  Scenario: Nested comprehension over the relationship list inside reduce
    Given an empty graph
    And having executed:
      """
      CREATE (:N {n: 'a'})-[:R {w: 1}]->(:N {n: 'b'})-[:R {w: 2}]->(:N {n: 'c'})
      """
    When executing query:
      """
      MATCH (:N {n: 'a'})-[rs:R*2..2]->(x)
      RETURN reduce(acc = 0, r IN [q IN rs | q.w] | acc + r) AS total
      """
    Then the result should be, in any order:
      | total |
      | 3     |

  Scenario: Relationship property projection keeps path order
    Given an empty graph
    And having executed:
      """
      CREATE (:N {n: 'a'})-[:R {w: 10}]->(:N {n: 'b'})-[:R {w: 20}]->(:N {n: 'c'})
      """
    When executing query:
      """
      MATCH p = (:N {n: 'a'})-[*2..2]->(:N)
      RETURN [r IN relationships(p) | r.w] AS ws
      """
    Then the result should be, in order:
      | ws       |
      | [10, 20] |
